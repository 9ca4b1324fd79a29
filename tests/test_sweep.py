"""Sweep driver semantics (the reference's Ax-sweeper contract:
maximize main()'s return over the search space)."""

import sweep


def test_grid_when_space_fits():
    space = {"a": [1, 2], "b": ["x", "y"]}
    cands = sweep.candidates(space, max_trials=4, seed=0)
    assert len(cands) == 4
    assert {"a": 1, "b": "x"} in cands and {"a": 2, "b": "y"} in cands


def test_random_subset_when_space_large():
    space = {"a": list(range(10)), "b": list(range(10))}
    cands = sweep.candidates(space, max_trials=5, seed=1)
    assert len(cands) == 5
    assert len({tuple(sorted(c.items())) for c in cands}) == 5


def test_run_sweep_maximizes():
    calls = []

    def fake_runner(overrides):
        calls.append(list(overrides))
        stride = next(
            int(o.split("=")[1]) for o in overrides
            if o.startswith("train.image.stride")
        )
        opt = next(
            o.split("=")[1] for o in overrides
            if o.startswith("train.attention.do_option")
        )
        return 10.0 * stride + (5.0 if '"*"' in opt else 0.0)

    best, value, history = sweep.run_sweep(
        sweep.DEFAULT_SPACE, max_trials=4, base_overrides=["main.seed=1"],
        runner=fake_runner,
    )
    assert best == {"train.image.stride": 2,
                    "train.attention.do_option": "*"}
    assert value == 25.0
    assert len(history) == 4
    assert all("main.seed=1" in c for c in calls)


def test_early_stop_on_stagnation():
    values = iter([5.0, 1.0, 1.0, 1.0, 9.0])

    def fake_runner(_):
        return next(values)

    _, value, history = sweep.run_sweep(
        {"a": [1, 2, 3, 4, 5]}, max_trials=5, base_overrides=[],
        max_stagnant=2, runner=fake_runner,
    )
    assert value == 5.0
    assert len(history) == 3  # stopped before the 9.0 trial


def test_parse_space_yaml_values():
    space = sweep.parse_space(["train.image.stride=1,2", "x=a,b"])
    assert space == {"train.image.stride": [1, 2], "x": ["a", "b"]}
