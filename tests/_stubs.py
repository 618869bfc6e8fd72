"""Import stubs that let the reference esm.inverse_folding package load without
torch_geometric / biotite, so it can serve as a numeric oracle.

The MessagePassing stub reimplements the (small) part of pyg's contract that
the reference GVPConv uses: kwargs gathered per-edge by _i (target) / _j
(source) suffix, message() applied, mean/add aggregation into target nodes.
"""

import inspect
import sys
import types

import torch


def install_torch_geometric_stub():
    if "torch_geometric" in sys.modules:
        return

    class MessagePassing(torch.nn.Module):
        def __init__(self, aggr="mean"):
            super().__init__()
            self.aggr = aggr

        def propagate(self, edge_index, **kwargs):
            src, dst = edge_index[0], edge_index[1]
            params = inspect.signature(self.message).parameters
            call = {}
            for name in params:
                if name.endswith("_i"):
                    call[name] = kwargs[name[:-2]][dst]
                elif name.endswith("_j"):
                    call[name] = kwargs[name[:-2]][src]
                else:
                    call[name] = kwargs[name]
            out = self.message(**call)
            n = kwargs["s"].shape[0]
            agg = torch.zeros(n, out.shape[-1], dtype=out.dtype)
            agg.index_add_(0, dst, out)
            if self.aggr == "mean":
                count = torch.zeros(n, dtype=out.dtype)
                count.index_add_(0, dst, torch.ones(dst.shape[0], dtype=out.dtype))
                agg = agg / count.clamp(min=1).unsqueeze(-1)
            return agg

    tg = types.ModuleType("torch_geometric")
    tg_nn = types.ModuleType("torch_geometric.nn")
    tg_nn.MessagePassing = MessagePassing
    tg.nn = tg_nn
    sys.modules["torch_geometric"] = tg
    sys.modules["torch_geometric.nn"] = tg_nn


def install_biotite_stub():
    if "biotite" in sys.modules:
        return
    names = [
        "biotite",
        "biotite.structure",
        "biotite.structure.io",
        "biotite.structure.io.pdbx",
        "biotite.structure.io.pdb",
        "biotite.structure.residues",
        "biotite.sequence",
    ]
    mods = {}
    for n in names:
        mods[n] = types.ModuleType(n)
        sys.modules[n] = mods[n]
    mods["biotite.structure"].AtomArray = type("AtomArray", (), {})
    mods["biotite.structure"].filter_backbone = lambda *a, **k: None
    mods["biotite.structure"].get_chains = lambda *a, **k: None
    mods["biotite.structure"].residues = mods["biotite.structure.residues"]
    mods["biotite.structure.residues"].get_residues = lambda *a, **k: None
    mods["biotite.structure"].io = mods["biotite.structure.io"]
    mods["biotite.structure.io"].pdbx = mods["biotite.structure.io.pdbx"]
    mods["biotite.structure.io"].pdb = mods["biotite.structure.io.pdb"]
    mods["biotite.sequence"].ProteinSequence = object
    mods["biotite"].structure = mods["biotite.structure"]
    mods["biotite"].sequence = mods["biotite.sequence"]


def install_all():
    install_torch_geometric_stub()
    install_biotite_stub()
