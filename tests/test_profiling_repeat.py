"""Direct tests for core/profiling.py and cli/repeat_runs.py.

These were the last two modules with no direct test (PhaseTimer was only
exercised implicitly through the engines; repeat_runs not at all).
"""

import json
import os
import pathlib
import time

import nnal_tpu.cli.repeat_runs as rr
from nnal_tpu.core.profiling import PhaseTimer


def test_phase_timer_accumulates_and_commits(tmp_path):
    path = str(tmp_path / "phases.jsonl")
    t = PhaseTimer(path)
    with t.phase("score"):
        time.sleep(0.01)
    with t.phase("score"):  # same phase twice -> durations accumulate
        time.sleep(0.01)
    with t.phase("train"):
        pass
    rec = t.commit_round(0, method="entropy")
    assert rec["round"] == 0 and rec["method"] == "entropy"
    assert rec["score"] >= 0.02 and rec["train"] >= 0.0
    assert t.current == {}  # reset for the next round

    with t.phase("select"):
        pass
    t.commit_round(1)

    lines = [json.loads(l)
             for l in pathlib.Path(path).read_text().splitlines()]
    assert [r["round"] for r in lines] == [0, 1]
    assert "score" in lines[0] and "select" in lines[1]
    assert "score" not in lines[1]  # no leakage across rounds
    assert t.records == lines


def test_phase_timer_records_on_exception(tmp_path):
    t = PhaseTimer()
    try:
        with t.phase("score"):
            raise ValueError("boom")
    except ValueError:
        pass
    assert "score" in t.current  # finally-path still records the duration
    rec = t.commit_round(0)
    assert rec["score"] >= 0.0
    assert t.path is None  # no file written without a path


def test_repeat_runs_counter_resume_and_durations(tmp_path, monkeypatch):
    calls = []

    def fake_do_expr(run_root, method, nqueries, overrides, synthetic=True):
        calls.append((run_root, method, nqueries, overrides))

    monkeypatch.setattr(rr, "do_expr", fake_do_expr)
    root = str(tmp_path / "rr")
    rr.repeat_runs(root, ["entropy", "random"], nqueries=3, n_runs=2,
                   overrides="k=2")

    # 2 runs x 2 methods, per-run seed override appended
    assert len(calls) == 4
    assert calls[0][0].endswith("run_0") and calls[2][0].endswith("run_1")
    assert calls[0][3] == "k=2,seed=0" and calls[2][3] == "k=2,seed=1"
    assert pathlib.Path(root, "counter.txt").read_text().strip() == "2"
    durations = pathlib.Path(root,
                             "durations.txt").read_text().splitlines()
    assert len(durations) == 2 and durations[0].startswith("0 ")

    # resume: counter says 2 -> n_runs=3 runs ONLY run_2
    calls.clear()
    rr.repeat_runs(root, ["entropy"], nqueries=3, n_runs=3)
    assert [c[0][-5:] for c in calls] == ["run_2"]
    assert calls[0][3] == "seed=2"  # empty overrides -> bare seed
    assert pathlib.Path(root, "counter.txt").read_text().strip() == "3"


def test_repeat_runs_main_usage(capsys):
    assert rr.main([]) == 1
    assert "usage" in capsys.readouterr().out


def test_subphase_spans_fold_into_round_records(tmp_path):
    from nnal_tpu.core.profiling import PhaseTimer, drain_subphases, subphase

    drain_subphases()   # isolate from any prior state
    path = str(tmp_path / "phases.jsonl")
    t = PhaseTimer(path)
    with t.phase("score_select"):
        with subphase("fi/sdp"):
            time.sleep(0.005)
        with subphase("fi/sdp"):     # accumulates
            pass
        with subphase("fi/gather"):
            pass
    rec = t.commit_round(0)
    assert "sub" in rec and set(rec["sub"]) == {"fi/sdp", "fi/gather"}
    assert rec["sub"]["fi/sdp"] >= 0.005
    # drained: the next round starts clean
    rec2 = t.commit_round(1)
    assert "sub" not in rec2
    lines = [json.loads(l)
             for l in pathlib.Path(path).read_text().splitlines()]
    assert lines[0]["sub"]["fi/gather"] >= 0.0
