"""bench.py output contract: the driver keeps only the last ~2000 chars
of stdout and parses the FINAL line. Round 5's official bench record was
lost because stage_counts shared that line and pushed it to ~4.9 KB.
These tests pin the contract without starting Spark."""

import json

import bench


def _mk(n_queries: int):
    timings = {f"query_name_number_{i:03d}": round(0.123 + i * 0.01, 3) for i in range(n_queries)}
    stage_counts = {n: {"jobs": 3, "stages": 7, "tasks": 224} for n in timings}
    return timings, stage_counts


def test_final_line_compact_and_parseable_at_current_size():
    timings, stage_counts = _mk(51)  # the current headline-set size
    earlier, final = bench.format_output(timings, 0.1, stage_counts, {})
    assert len(final) <= bench.FINAL_LINE_MAX
    rec = json.loads(final)
    assert rec["metric"] == "headline_queries_total_runtime"
    assert rec["unit"] == "sec"
    assert rec["value"] == round(sum(timings.values()), 3)
    assert rec["queries"] == timings  # full detail fits at this scale
    assert rec["sf"] == 0.1
    # stage_counts live on an earlier line, never the final one
    assert "stage_counts" not in rec
    assert any("stage_counts" in json.loads(l) for l in earlier)


def test_final_line_truncates_to_top_movers_when_oversized():
    timings, stage_counts = _mk(400)  # would be ~16 KB if inlined
    _, final = bench.format_output(timings, 0.1, stage_counts, {})
    assert len(final) <= bench.FINAL_LINE_MAX
    rec = json.loads(final)
    assert rec["value"] == round(sum(timings.values()), 3)
    kept = rec["queries"]
    assert rec["queries_truncated_to_top"] == len(kept)
    # kept set is the slowest queries, so the max dropped < min kept
    dropped = {n: t for n, t in timings.items() if n not in kept}
    assert max(dropped.values()) <= min(kept.values())


def test_errors_reported_on_earlier_line_and_counted():
    timings, stage_counts = _mk(10)
    errors = {"bad_query": "ValueError: boom"}
    earlier, final = bench.format_output(timings, 0.01, stage_counts, errors)
    rec = json.loads(final)
    assert rec["error_count"] == 1
    assert "errors" not in rec  # the errors MAP never rides the final line
    assert any("errors" in json.loads(l) for l in earlier)


def test_final_line_always_emitted_even_when_nothing_fits():
    # pathological sf payload: even with queries fully trimmed the line
    # would overflow — the degrade path drops per-query detail but MUST
    # still emit a parseable headline record (a bare assert here would
    # have lost the whole bench run)
    timings, stage_counts = _mk(5)
    huge_sf = "sf" * 2000
    _, final = bench.format_output(timings, huge_sf, stage_counts, {})
    rec = json.loads(final)
    assert rec["metric"] == "headline_queries_total_runtime"
    assert rec["value"] == round(sum(timings.values()), 3)
    assert "queries" not in rec
    assert rec["queries_dropped_oversize"] is True


def test_truncation_warns_on_stderr(capsys):
    timings, stage_counts = _mk(400)
    bench.format_output(timings, 0.1, stage_counts, {})
    assert "truncated to top" in capsys.readouterr().err


def test_error_counts_split_per_record_line():
    # r10: each record line carries only ITS OWN error count (ADVICE r9
    # — the v2 line used to hardcode 0, hiding v2 failures)
    timings, stage_counts = _mk(5)
    v2 = {f"v2_query_{i}": 1.0 for i in range(3)}
    errors = {"v1_bad": "boom", "v2_bad": "boom"}
    earlier, final = bench.format_output(
        timings, 0.01, stage_counts, errors, v2_timings=v2,
        v1_error_count=1, v2_error_count=1,
    )
    assert json.loads(final)["error_count"] == 1
    v2_rec = next(
        json.loads(l) for l in earlier
        if '"headline_v2_total_runtime"' in l
    )
    assert v2_rec["error_count"] == 1
