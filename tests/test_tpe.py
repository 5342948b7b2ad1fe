"""TPE Bayesian sweep optimizer (`train/tpe.py` + `method: bayes` in the
sweeper). The reference delegates bayes sweeps to wandb's hosted optimizer
(`base_ml/base_experiment.py:296-352`); these tests pin the local
equivalent: sequential model-based proposals that beat random search on a
smooth objective, schema coverage (categorical / uniform / int / log),
and the claim-file protocol staying exactly-once with adaptive proposals."""

import json
import random as pyrandom

from cellvit_tpu.train import tpe


def _space():
    return {
        "training.lr": {"min": 0.0, "max": 1.0},
        "training.layers": {"min": 1, "max": 8},
        "training.opt": {"values": ["adam", "sgd"]},
    }


def test_startup_random_respects_schema():
    rng = pyrandom.Random(0)
    for _ in range(50):
        a = tpe.random_assignment(
            {**_space(), "c": {"value": 7},
             "wd": {"min": 1e-6, "max": 1e-1, "distribution": "log_uniform"}},
            rng,
        )
        assert 0.0 <= a["training.lr"] <= 1.0
        assert 1 <= a["training.layers"] <= 8 and isinstance(a["training.layers"], int)
        assert a["training.opt"] in ("adam", "sgd")
        assert a["c"] == 7
        assert 1e-6 <= a["wd"] <= 1e-1


def _run_loop(proposer, loss_fn, n_iters, seed):
    rng = pyrandom.Random(seed)
    obs = []
    for _ in range(n_iters):
        a = proposer(obs, rng)
        obs.append((a, loss_fn(a)))
    return min(s for _, s in obs)


def test_tpe_beats_random_on_smooth_objective():
    """Quadratic bowl at lr=0.7, layers=3, opt=adam: with the same budget
    and seed family, TPE's best must beat pure random's best."""
    space = _space()

    def loss(a):
        return (
            (a["training.lr"] - 0.7) ** 2
            + 0.05 * (a["training.layers"] - 3) ** 2
            + (0.0 if a["training.opt"] == "adam" else 0.3)
        )

    tpe_best = [
        _run_loop(lambda o, r: tpe.propose(space, o, r), loss, 40, seed)
        for seed in range(3)
    ]
    rand_best = [
        _run_loop(lambda o, r: tpe.random_assignment(space, r), loss, 40, seed)
        for seed in range(3)
    ]
    assert sum(tpe_best) < sum(rand_best)
    assert min(tpe_best) < 0.01


def test_tpe_concentrates_on_good_region():
    """After clear evidence, proposals should cluster near the optimum and
    pick the winning categorical arm most of the time."""
    space = _space()
    rng = pyrandom.Random(1)
    obs = []
    for k in range(30):
        lr = k / 30.0
        obs.append((
            {"training.lr": lr, "training.layers": 4,
             "training.opt": "adam" if k % 2 else "sgd"},
            (lr - 0.5) ** 2 + (0.0 if k % 2 else 0.5),
        ))
    props = [tpe.propose(space, obs, rng) for _ in range(40)]
    near = [p for p in props if abs(p["training.lr"] - 0.5) < 0.2]
    adam = [p for p in props if p["training.opt"] == "adam"]
    assert len(near) > 20
    assert len(adam) > 24


def test_tpe_log_uniform_bounds():
    spec = {"wd": {"min": 1e-6, "max": 1e-1, "distribution": "log_uniform"}}
    rng = pyrandom.Random(2)
    obs = [({"wd": 10 ** -(2 + (i % 3))}, float(i % 3)) for i in range(12)]
    for _ in range(30):
        a = tpe.propose(spec, obs, rng)
        assert 1e-6 <= a["wd"] <= 1e-1


def test_bayes_sweep_e2e_adaptive(tmp_path):
    """End-to-end `method: bayes` through create_sweep/run_agent: proposals
    are made at claim time, persisted per run, recorded in results, and the
    search lands near the optimum of a smooth metric."""
    from cellvit_tpu.train.sweeper import create_sweep, run_agent

    config = {
        "logging": {"log_dir": str(tmp_path / "runs"), "log_comment": "x"},
        "sweep": {"method": "bayes", "name": "tpe", "run_cap": 25,
                  "metric": {"name": "bPQ", "goal": "maximize"}},
        "parameters": {"training.lr": {"min": 0.0, "max": 6.0}},
    }
    sweep_dir = create_sweep(config)
    spec = json.loads((sweep_dir / "sweep.json").read_text())
    assert spec["assignments"] == [None] * 25

    class Smooth:
        def __init__(self, cfg):
            self.cfg = cfg

        def run_experiment(self):
            lr = self.cfg["training"]["lr"]
            d = tmp_path / f"run_{lr}"
            d.mkdir(exist_ok=True)
            (d / "metrics.jsonl").write_text(
                json.dumps({"Validation/bPQ": -((lr - 3.0) ** 2)}) + "\n"
            )
            return d, None, None, None

    best, records = run_agent(sweep_dir, Smooth, "agent0")
    assert len(records) == 25
    assert all(r["assignment"] is not None for r in records)
    # every run persisted its proposal for reclaim-reproducibility
    assert len(list((sweep_dir / "runs").glob("run*.assignment.json"))) == 25
    assert abs(best["assignment"]["training.lr"] - 3.0) < 0.75
    # the tail of the search concentrates vs the random startup phase
    tail = [abs(r["assignment"]["training.lr"] - 3.0) for r in records[15:]]
    assert sorted(tail)[len(tail) // 2] < 1.5  # median of the tail is close


def test_bayes_reclaim_reruns_same_point(tmp_path):
    """A reclaimed bayes run re-executes its persisted proposal instead of
    drawing a new point (the claim-file protocol stays deterministic)."""
    from cellvit_tpu.train.sweeper import create_sweep, run_agent

    config = {
        "logging": {"log_dir": str(tmp_path / "runs"), "log_comment": "x"},
        "sweep": {"method": "bayes", "name": "rc", "run_cap": 3,
                  "metric": {"name": "bPQ", "goal": "maximize"}},
        "parameters": {"training.lr": {"min": 0.0, "max": 1.0}},
    }
    sweep_dir = create_sweep(config)
    seen = []

    class Recorder:
        def __init__(self, cfg):
            self.cfg = cfg

        def run_experiment(self):
            seen.append(self.cfg["training"]["lr"])
            d = tmp_path / "run"
            d.mkdir(exist_ok=True)
            (d / "metrics.jsonl").write_text('{"Validation/bPQ": 0.1}\n')
            return d, None, None, None

    run_agent(sweep_dir, Recorder, "agent0")
    first = json.loads((sweep_dir / "runs" / "run1.assignment.json").read_text())
    # simulate a hard-killed agent: claim+assignment persist, result vanishes
    (sweep_dir / "runs" / "run1.result.json").unlink()
    (sweep_dir / "runs" / "run1.claim").unlink()
    seen.clear()
    run_agent(sweep_dir, Recorder, "agent1")
    assert seen == [first["training.lr"]]
