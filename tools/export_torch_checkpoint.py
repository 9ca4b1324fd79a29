"""Convert a dl_vqa_tpu checkpoint to a reference-format PyTorch .pth.

    python tools/export_torch_checkpoint.py <in.ckpt> <out.pth>

The output blob ({'epoch', 'model_state', 'optimizer_state'}) loads into
the unmodified reference (`/root/reference/models/model.py` VqaNet via
load_state_dict(strict=True); `/root/reference/evaluate_vqa.py` reads it
directly) — the inverse of importing reference checkpoints with
utils/torch_import. Requires the checkpoint to carry model_cfg metadata
(every checkpoint saved by this repo's training loop does).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv) -> int:
    if len(argv) != 2:
        raise SystemExit(__doc__)
    src, dst = argv

    import jax
    import jax.numpy as jnp

    from dl_vqa_tpu.models import ModelConfig, vqa
    from dl_vqa_tpu.utils.checkpoint import load_checkpoint, load_params
    from dl_vqa_tpu.utils.torch_export import save_torch_checkpoint

    _, meta = load_checkpoint(src)
    if not meta.get("model_cfg"):
        raise SystemExit(
            f"{src!r} carries no model_cfg metadata; re-save it with "
            "utils.checkpoint.save_checkpoint(..., model_cfg=...) or "
            "export from the Predictor API"
        )
    cfg = ModelConfig.from_meta_dict(meta["model_cfg"])
    with jax.default_device(jax.devices("cpu")[0]):
        template = jax.eval_shape(
            lambda: vqa.init(jax.random.PRNGKey(0), cfg)
        )
        template = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), template
        )
        params = load_params(src, template)
    save_torch_checkpoint(dst, params, epoch=int(meta.get("epoch") or 0))
    print(f"wrote {dst} (epoch {meta.get('epoch')}, "
          f"{len(jax.tree_util.tree_leaves(params))} tensors)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
