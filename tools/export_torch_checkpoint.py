"""Convert a dl_vqa_tpu checkpoint to a reference-format PyTorch .pth.

    python tools/export_torch_checkpoint.py <in.ckpt> <out.pth>

The output blob ({'epoch', 'model_state', 'optimizer_state'}) loads into
the unmodified reference (`/root/reference/models/model.py` VqaNet via
load_state_dict(strict=True); `/root/reference/evaluate_vqa.py` reads it
directly) — the inverse of importing reference checkpoints with
utils/torch_import. Only the reference CNN/LSTM model family converts
(utils/torch_export raises for ViT/transformer/co-attention params).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv) -> int:
    if len(argv) != 2:
        raise SystemExit(__doc__)
    src, dst = argv

    import jax

    from dl_vqa_tpu.utils.checkpoint import load_params
    from dl_vqa_tpu.utils.torch_export import save_torch_checkpoint

    # One read: with no template, load_params rebuilds the nested tree
    # from the flat npz keys (a second load_checkpoint for metadata would
    # decompress the whole checkpoint twice).
    params, meta = load_params(src, with_meta=True)
    save_torch_checkpoint(dst, params, epoch=int(meta.get("epoch") or 0))
    print(f"wrote {dst} (epoch {meta.get('epoch')}, "
          f"{len(jax.tree_util.tree_leaves(params))} tensors)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
