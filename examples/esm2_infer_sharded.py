"""Large-model inference via mesh sharding (TPU-native replacement for the
reference's fairscale-FSDP CPU-offload example,
examples/esm2_infer_fairscale_fsdp_cpu_offloading.py).

The reference wraps each of ESM2-15B's 48 layers in FSDP with CPU offload to
squeeze onto one GPU. On TPU the params are simply sharded over the mesh:
column/row-parallel (tp) within a host's chips, ZeRO-style (fsdp) across the
rest — no host offload, no NCCL, no wrapper classes.

Run (single host, all local devices):
    python examples/esm2_infer_sharded.py --model esm2_t48_15B_UR50D
Multi-host: initialize jax.distributed first (one line, see below) and run the
same script on every host.
"""

import argparse

import jax
import jax.numpy as jnp

from esm_tpu import pretrained
from esm_tpu.parallel.mesh import MeshConfig, make_mesh
from esm_tpu.parallel.scaling import warn_if_inefficient
from esm_tpu.parallel.sharding import batch_sharding, shard_params


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="esm2_t48_15B_UR50D")
    parser.add_argument("--multihost", action="store_true")
    args = parser.parse_args()

    if args.multihost:
        jax.distributed.initialize()  # env-driven on TPU pods

    model, alphabet = pretrained.load_model_and_alphabet(args.model)

    n = len(jax.devices())
    mesh_cfg = MeshConfig.for_devices(n)
    mesh = make_mesh(mesh_cfg)
    print(f"mesh: {mesh.shape}")

    params = shard_params(mesh, model.params)
    model.params = params

    data = [
        ("protein1", "MKTVRQERLKSIVRILERSKEPVSGAQLAEELSVSRQVIVQDIAYLRSLGYNIVATPRGYVLAGG"),
        ("protein2", "KALTARQQEVFDLIRDHISQTGMPPTRAEIAQRLGFRSPNAAEEHLKALARKGVIEIVSGASRGIRLLQEE"),
    ]
    _, _, tokens = alphabet.get_batch_converter(pad_to_multiple=128)(data)
    # predicted ICI-vs-MXU balance for this mesh AT THE ACTUAL workload shape
    # (a hardcoded shape can mischaracterize the run — e.g. flag a
    # weight-gather bound that a larger batch amortizes); warns on the
    # documented-bad configs (ARCHITECTURE.md scaling model — e.g. 15B at
    # B=1 is weight-bound: the right 15B deployment is int8 on ONE chip)
    warn_if_inefficient(
        model.cfg, mesh_cfg, batch=int(tokens.shape[0]), seqlen=int(tokens.shape[1])
    )
    tokens = jax.device_put(jnp.asarray(tokens), batch_sharding(mesh))

    out = model(tokens, repr_layers=[model.num_layers])
    reps = out["representations"][model.num_layers]
    for i, (label, seq) in enumerate(data):
        emb = jnp.mean(reps[i, 1 : len(seq) + 1], axis=0)
        print(label, "mean embedding norm:", float(jnp.linalg.norm(emb)))


if __name__ == "__main__":
    main()
