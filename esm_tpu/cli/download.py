"""Bulk checkpoint downloader (reference scripts/download_weights.sh).

Downloads all (or selected) model checkpoints + regression weights into the
local cache and smoke-loads each.
"""

from __future__ import annotations

import argparse


def create_parser():
    p = argparse.ArgumentParser(description="Download esm_tpu model weights")
    p.add_argument("names", nargs="*", help="model names (default: all LM + esmfold_v1)")
    p.add_argument("--skip-load", action="store_true", help="download only, no smoke load")
    return p


def main():
    from .. import pretrained

    args = create_parser().parse_args()
    names = args.names or pretrained._LM_NAMES + ["esmfold_3B_v1"]
    for name in names:
        print(f"downloading {name} ...")
        if name.startswith("esmfold"):
            path = pretrained._download(pretrained.MODEL_URL.format(name))
            print(f"  -> {path}")
            if args.skip_load:
                # still fetch the LM checkpoint this fold model depends on
                # (load_esmfold does this itself in the smoke-load path)
                import torch

                ck = torch.load(path, map_location="cpu", weights_only=False)
                lm_name = pretrained.ESM_REGISTRY_FOR_FOLD[ck["cfg"]["model"].esm_type]
                pretrained._download(pretrained.MODEL_URL.format(lm_name))
                if pretrained._has_regression_weights(lm_name):
                    pretrained._download(pretrained.REGRESSION_URL.format(lm_name))
            else:
                pretrained.load_esmfold(name)
        else:
            pretrained._download(pretrained.MODEL_URL.format(name))
            if pretrained._has_regression_weights(name):
                pretrained._download(pretrained.REGRESSION_URL.format(name))
            if not args.skip_load:
                model, _ = pretrained.load_model_and_alphabet_hub(name)
                print(f"  loaded ({getattr(model, 'kind', 'if')})")


if __name__ == "__main__":
    main()
