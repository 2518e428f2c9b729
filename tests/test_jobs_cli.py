"""Argument-contract tests for jobs/build_sketches.py — every rejection
happens in argparse before a SparkSession exists, so these are
subprocess-cheap.  The accepted paths are exercised end-to-end by the
committed capacity artifacts (BENCH/capacity_*_r5.json) and the 60k-page
A/B smoke."""

import os
import subprocess
import sys

JOB = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "jobs", "build_sketches.py")


def _run(*argv):
    return subprocess.run([sys.executable, JOB, *argv],
                          capture_output=True, text=True, timeout=60)


def test_sharded_bloom_zero_rejected():
    """S=0 used to be falsy and silently fell through to the monolith."""
    r = _run("--pages", "100", "--sharded-bloom", "0")
    assert r.returncode == 2
    assert "S >= 1" in r.stderr


def test_sharded_and_monolith_mutually_exclusive():
    r = _run("--pages", "100", "--sharded-bloom", "--monolith-bloom")
    assert r.returncode == 2
    assert "mutually exclusive" in r.stderr


def test_ab_bloom_rejects_mode_and_checkpoint_flags():
    """--ab-bloom owns both modes and its own throwaway checkpoints; a
    forced mode or durable checkpoint dir would break the interleaving."""
    for extra in (["--monolith-bloom"], ["--sharded-bloom"],
                  ["--checkpoint-dir", "/tmp/x"]):
        r = _run("--pages", "100", "--ab-bloom", *extra)
        assert r.returncode == 2, extra
        assert "incompatible" in r.stderr, extra
