"""Per-HLO-fusion time table for any bench step — the measurement loop
behind docs/PERF_NOTES.md, automated.

    python tools/fusion_table.py [--train] [--vit] [--f8-stem]
                                 [--steps 5] [--top 25] [--json out.json]

Traces ``--steps`` executions of the selected jitted step (same model,
batch size, and dtypes as bench.py) with ``jax.profiler``, converts the
xplane via xprof's hlo_stats tool, and prints the top HLO ops by total
device self-time with occurrence counts and per-step averages. Per-call
dispatch RTT does not pollute per-op device times, so this does not need
the on-device-loop trick the wall-clock benches use.

Requires the baked-in ``xprof`` package (pure-python protobuf parsing is
forced — the installed fast-proto bindings predate the generated code).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture_trace(step_kind: str, vit: bool, f8_stem: bool, steps: int,
                  trace_dir: str) -> None:
    import jax
    import jax.numpy as jnp

    import bench

    cfg, params = bench.build(vit=vit, f8_stem=f8_stem)
    batch = bench.make_batch(cfg, bench.BATCH_SIZE)
    batch["images"] = jnp.asarray(batch["images"]).astype(jnp.bfloat16)

    if step_kind == "train":
        from dl_vqa_tpu.train.state import create_train_state
        from dl_vqa_tpu.train.steps import make_optimizer, make_train_step

        jax.config.update("jax_default_prng_impl", "rbg")
        tx = make_optimizer(5e-4)
        state = create_train_state(params, tx)
        step = make_train_step(cfg, tx, compute_dtype=jnp.bfloat16)
        rng = jax.random.PRNGKey(0)
        state, metrics = step(state, batch, rng)  # compile + warm
        jax.block_until_ready(metrics)
        with jax.profiler.trace(trace_dir):
            for _ in range(steps):
                state, metrics = step(state, batch, rng)
            jax.block_until_ready(metrics)
    else:
        from dl_vqa_tpu.models import vqa as vqa_model
        from dl_vqa_tpu.ops.vqa_metrics import vqa_batch_stats

        @jax.jit
        def eval_step(params, batch):
            logits = vqa_model.apply(
                params, cfg, batch["images"], batch["questions"],
                batch["lengths"], train=False, compute_dtype=jnp.bfloat16,
            )
            return vqa_batch_stats(
                logits, batch["answer_indices"], batch["answer_values"],
                batch["mask"],
            )

        out = eval_step(params, batch)
        jax.block_until_ready(out)
        with jax.profiler.trace(trace_dir):
            for _ in range(steps):
                out = eval_step(params, batch)
            jax.block_until_ready(out)


def hlo_stats_rows(trace_dir: str):
    """Convert the captured xplane to xprof hlo_stats rows (list of
    dicts)."""
    from xprof.convert import raw_to_tool_data

    paths = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    ))
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    data, _content_type = raw_to_tool_data.xspace_to_tool_data(
        paths, "hlo_stats", {}
    )
    if isinstance(data, bytes):
        data = data.decode()
    payload = json.loads(data)
    # GViz-style table: first element carries cols/rows.
    table = payload[0] if isinstance(payload, list) else payload
    cols = [c["label"] for c in table["cols"]]
    rows = []
    for row in table["rows"]:
        rows.append({
            col: cell.get("v") if isinstance(cell, dict) else cell
            for col, cell in zip(cols, row["c"])
        })
    return rows


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--train", action="store_true")
    parser.add_argument("--vit", action="store_true")
    parser.add_argument("--f8-stem", action="store_true")
    parser.add_argument("--steps", type=int, default=5)
    parser.add_argument("--top", type=int, default=25)
    parser.add_argument("--json", default="",
                        help="also dump the full rows as JSON")
    parser.add_argument("--trace-dir", default="",
                        help="keep the raw trace here (default: temp dir)")
    args = parser.parse_args(argv)

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="fusion_table_")
    kind = "train" if args.train else "eval"
    capture_trace(kind, args.vit, args.f8_stem, args.steps, trace_dir)
    rows = hlo_stats_rows(trace_dir)

    import re

    entries = []
    for row in rows:
        total_us = row.get("Total self time (us)")
        if total_us is None:
            continue
        src = row.get("Source Info") or ""
        m = re.search(r"title='([^':\n]+:\d+)", src)
        bw = row.get("Measured memory BW (GiB/s)") or 0.0
        gflops = row.get("Model GFLOP/s") or 0.0
        entries.append({
            "op": row.get("HLO op name"),
            "category": row.get("HLO op category"),
            "framework_op": row.get("Framework op name"),
            "count": row.get("#Occurrences"),
            "total_us": float(total_us),
            "bound_by": row.get("Bound by"),
            "bw_gibps": round(float(bw), 1),
            "gflops": round(float(gflops), 1),
            "source": m.group(1).replace("/root/repo/", "") if m else "",
            "hlo": (row.get("HLO op text") or "")[:160],
        })
    entries.sort(key=lambda e: -e["total_us"])
    total = sum(e["total_us"] for e in entries)

    model = "ViT" if args.vit else "CNN"
    extra = " +f8-stem" if args.f8_stem else ""
    print(f"# {kind} step, {model}{extra}, batch 512 x {args.steps} steps "
          f"— total device time {total / args.steps / 1e3:.2f} ms/step")
    print(f"{'ms/step':>8} {'%':>5} {'bound':>7} {'GiB/s':>7} "
          f"{'category':<22} {'op':<24} source")
    for e in entries[: args.top]:
        ms = e["total_us"] / args.steps / 1e3
        share = 100.0 * e["total_us"] / total if total else 0.0
        print(f"{ms:8.3f} {share:5.1f} {str(e['bound_by']):>7} "
              f"{e['bw_gibps']:7.0f} {str(e['category']):<22} "
              f"{str(e['op']):<24} {e['source']}")

    if args.json:
        with open(args.json, "w") as fd:
            json.dump(entries, fd, indent=1)
        print(f"\nfull table -> {args.json}")
    if not args.trace_dir:
        print(f"(raw trace kept in {trace_dir})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
