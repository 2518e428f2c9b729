"""envprobe: fixed-workload machine-phase probe carried in bench JSONs."""

from sketchlib.envprobe import env_probe, probe


def test_probe_reports_positive_throughputs():
    r = env_probe(reps=1)
    for key in ("stream_gbps", "scatter_mops", "stream_gbps_mt",
                "py_mops"):
        assert r[key] > 0
    assert r["probe_threads"] >= 1
    assert 0 < r["probe_secs"] < 60


def test_probe_work_is_fixed():
    # the workload must be identical every call (machine phase is the
    # only variable): the reduction results are pure functions of it
    a, b = probe(), probe()
    assert a["_acc"] == b["_acc"]
    assert a["_acc_py"] == b["_acc_py"]


def test_best_of_reps_takes_max():
    one = env_probe(reps=1)
    three = env_probe(reps=3)
    # max-of-3 of a noisy throughput should not be materially below a
    # single sample taken seconds earlier (loose 2x guard: a tighter
    # bound would flake on hypervisor phase boundaries)
    assert three["stream_gbps"] > one["stream_gbps"] / 2
