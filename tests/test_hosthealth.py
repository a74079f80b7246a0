"""Pure-unit pins for the bench self-validation verdict logic — no Spark,
no real probes. The stamps gate which BENCH artifacts are committable
(CLAUDE.md: never commit host_ok=false), so the verdict arithmetic itself
must be falsifiable: a wrong fallback here silently blesses degraded
numbers or aborts the harness AFTER the timed work completed."""

from __future__ import annotations

from otlp_wire_spark.hosthealth import section_verdict


def _stamp(control=0.14, steal=0.1):
    return {"control_sec": control, "steal_pct": steal}


def test_quiet_window_passes():
    v = section_verdict(_stamp(0.140, 0.1), _stamp(0.142, 0.2))
    assert v["host_ok"] and v["steal_known"]
    assert v["control_drift"] < 0.02


def test_steal_over_threshold_fails():
    v = section_verdict(_stamp(0.14, 0.1), _stamp(0.14, 3.3))
    assert not v["host_ok"]


def test_control_drift_over_tolerance_fails():
    v = section_verdict(_stamp(0.14, 0.1), _stamp(0.17, 0.1))
    assert v["control_drift"] > 0.15 and not v["host_ok"]


def test_unknown_steal_falls_back_to_control_only():
    # no /proc/stat (macOS, restricted container): absence of evidence is
    # not degradation — a quiet control pair still vouches for the window
    v = section_verdict(_stamp(0.14, None), _stamp(0.141, None))
    assert v["host_ok"] and not v["steal_known"]
    v2 = section_verdict(_stamp(0.14, None), _stamp(0.18, None))
    assert not v2["host_ok"]


def test_missing_control_falls_back_to_steal_only():
    # hand-built stamp without a control reading must not TypeError after
    # the timed work completed — degrade to the steal verdict
    v = section_verdict(_stamp(None, 0.1), _stamp(0.14, 0.2))
    assert v["control_drift"] is None
    assert v["host_ok"]
    v2 = section_verdict(_stamp(None, 0.1), _stamp(0.14, 9.9))
    assert not v2["host_ok"]


def test_no_evidence_at_all_cannot_vouch():
    v = section_verdict(_stamp(None, None), _stamp(None, None))
    assert not v["host_ok"]


def test_membw_is_report_only():
    # the bandwidth reading rides the stamp for grader forensics but must
    # never flip a verdict: identical control/steal with wildly different
    # membw readings stays host_ok
    a = _stamp(0.14, 0.1)
    b = _stamp(0.141, 0.1)
    a["membw_gbps"], b["membw_gbps"] = 20.0, 2.0
    v = section_verdict(a, b)
    assert v["host_ok"]
    assert v["before"]["membw_gbps"] == 20.0  # preserved for the record


def test_membw_probe_returns_positive_or_none():
    from otlp_wire_spark.hosthealth import membw_probe

    bw = membw_probe(nbytes=8 * 1024 * 1024)
    assert bw is None or bw > 0
