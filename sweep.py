"""Hyperparameter sweep driver.

Replaces the reference's Hydra-Ax Bayesian sweeper
(``/root/reference/config/config.yaml:91-132``): maximize the value
returned by ``main(cfg)`` (best validation accuracy) over a declared
search space, with ``max_trials`` and early stopping after
``max_epochs_without_improvement`` stagnant trials.

The default space is the reference's active one — ``train.image.stride in
{1, 2}`` x ``train.attention.do_option in {'+', '*'}`` — explored
exhaustively when the space is small (<= max_trials points, where grid ==
any optimizer). Larger spaces use model-based Bayesian search: a
categorical TPE (:mod:`dl_vqa_tpu.utils.tpe`) proposing each next trial
from the good/bad density ratio of the history, matching the Ax sweeper's
capability. ``--sampler random`` keeps seeded random search as a baseline.

    python sweep.py [--trials N] [--sampler tpe|random]
                    [--space key=v1,v2 ...] [overrides...]
"""

from __future__ import annotations

import argparse
import itertools
import json
import random
import sys
from typing import Dict, List, Sequence, Tuple

import yaml

DEFAULT_SPACE: Dict[str, List] = {
    "train.image.stride": [1, 2],
    "train.attention.do_option": ["+", "*"],
}


def _parse_scalar(raw: str):
    # One parser for override values everywhere: config.core's also
    # coerces unquoted '5e-4' to a float (YAML 1.1 reads it as a
    # string), so sweep-space values match what the dotlist would set.
    from dl_vqa_tpu.config.core import _parse_value

    return _parse_value(raw)


def parse_space(items: Sequence[str]) -> Dict[str, List]:
    space = {}
    for item in items:
        key, raw = item.split("=", 1)
        space[key] = [_parse_scalar(v) for v in raw.split(",")]
    return space


def space_size(space: Dict[str, List]) -> int:
    """Number of points in the cartesian space, WITHOUT materializing it
    (a 10-key space can have billions of points; deciding grid-vs-TPE
    must not enumerate them)."""
    size = 1
    for values in space.values():
        size *= len(values)
    return size


def _full_grid(space: Dict[str, List]) -> List[Dict]:
    keys = list(space)
    return [dict(zip(keys, combo))
            for combo in itertools.product(*(space[k] for k in keys))]


def _next_assignment(space: Dict[str, List], grid: List[Dict],
                     history: List[Dict], trial: int, sampler: str,
                     rng: random.Random):
    """Next point: exhaustive when the grid fits in the budget (== optimal),
    else TPE (model-based) or seeded random-without-replacement."""
    if grid is not None:
        return grid[trial] if trial < len(grid) else None
    pairs = [(h["assignment"], h["value"]) for h in history]
    if sampler == "random":
        from dl_vqa_tpu.utils.tpe import suggest

        # n_startup=inf degrades TPE to uniform random over untried points.
        return suggest(space, pairs, rng, n_startup=10 ** 9)
    from dl_vqa_tpu.utils.tpe import suggest

    return suggest(space, pairs, rng)


def run_sweep(space: Dict[str, List], max_trials: int,
              base_overrides: Sequence[str], seed: int = 0,
              max_stagnant: int = 4,
              runner=None, sampler: str = "tpe") -> Tuple[Dict, float, List]:
    """Returns (best_assignment, best_value, history)."""
    if runner is None:
        from dl_vqa_tpu import config as config_mod
        import main as main_mod

        def runner(overrides):
            cfg = config_mod.compose("config", overrides=list(overrides))
            return main_mod.main(cfg)

    # None => model-based (TPE); materialize only when it fits the budget.
    grid = _full_grid(space) if space_size(space) <= max_trials else None
    rng = random.Random(seed)

    best_value, best_assignment = float("-inf"), None
    stagnant = 0
    history: List[Dict] = []
    for trial in range(max_trials):
        assignment = _next_assignment(
            space, grid, history, trial, sampler, rng
        )
        if assignment is None:  # space exhausted
            break
        overrides = list(base_overrides) + [
            f"{k}={json.dumps(v)}" for k, v in assignment.items()
        ]
        value = float(runner(overrides))
        history.append({"trial": trial, "assignment": assignment,
                        "value": value})
        print(f"[sweep] trial {trial}: {assignment} -> {value:.4f}")
        if value > best_value:
            best_value, best_assignment = value, assignment
            stagnant = 0
        else:
            stagnant += 1
            if stagnant >= max_stagnant:
                print("[sweep] early stop: no improvement")
                break
    print(f"[sweep] best: {best_assignment} -> {best_value:.4f}")
    return best_assignment, best_value, history


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--trials", type=int, default=4)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--stagnant", type=int, default=4)
    parser.add_argument("--space", action="append", default=[],
                        help="key=v1,v2 (repeatable); default: reference space")
    parser.add_argument("--sampler", choices=("tpe", "random"),
                        default="tpe",
                        help="search strategy when the space exceeds the "
                             "trial budget (default: TPE Bayesian search)")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args()

    space = parse_space(args.space) if args.space else DEFAULT_SPACE
    run_sweep(space, args.trials, args.overrides, seed=args.seed,
              max_stagnant=args.stagnant, sampler=args.sampler)
