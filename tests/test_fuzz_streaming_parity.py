"""S27 — seeded batch↔streaming parity fuzz over the reference's core
aggregation shape (the generalization of S2's single fixed case):
random window/slide combinations, event spacing, and bounded
out-of-orderness, each run BOTH as an availableNow multi-batch stream
(complete mode — every window survives, so watermark finalization
cannot hide a mismatch) and as the identical batch plan over the same
files. Exact-match on counts and decimal-free exact sums; the
order-sensitive approx percentiles are compared with tolerance, same
as S2."""

import math
import shutil
import tempfile

import pytest

from real_time_event_streaming_analytics_platform_spark.sources.fixtures import (
    generate_events,
    write_jsonl,
)
from real_time_event_streaming_analytics_platform_spark.streaming.entries import (
    parse_events,
    read_event_stream,
    run_available_now,
    sliding_aggregates,
)


@pytest.fixture
def tmpdir():
    d = tempfile.mkdtemp(prefix="sgr-sfuzz-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


_CASES = [
    # (seed, n_events, interval_ms, out_of_order_ms, window, slide, n_files)
    (101, 400, 700, 2000, "30 seconds", "10 seconds", 3),
    (102, 500, 300, 5000, "2 minutes", "30 seconds", 4),
    (103, 350, 1100, 0, "45 seconds", "15 seconds", 2),
    (104, 600, 250, 8000, "1 minute", "1 minute", 5),   # tumbling
    (105, 450, 900, 3000, "90 seconds", "45 seconds", 3),
    (106, 300, 1500, 9000, "20 seconds", "4 seconds", 4),  # high overlap
]


@pytest.mark.parametrize("case", _CASES, ids=[f"seed{c[0]}" for c in _CASES])
def test_s27_windowed_aggregate_parity_fuzz(spark, tmpdir, case):
    seed, n, interval_ms, ooo_ms, window, slide, n_files = case
    events = generate_events(
        n, seed=seed, interval_ms=interval_ms, out_of_order_ms=ooo_ms
    )
    write_jsonl(events, f"{tmpdir}/in", n_files=n_files)

    stream_res = run_available_now(
        sliding_aggregates(
            parse_events(
                read_event_stream(spark, f"{tmpdir}/in", max_files_per_trigger=1)
            ),
            window=window,
            slide=slide,
        ),
        f"{tmpdir}/ck",
        output_mode="complete",
        name=f"s27_{seed}",
    ).collect()

    raw = spark.read.text(f"{tmpdir}/in").withColumnRenamed("value", "raw")
    batch_res = sliding_aggregates(
        parse_events(raw), window=window, slide=slide
    ).collect()

    s = {(r["window_start"], r["source"]): r for r in stream_res}
    b = {(r["window_start"], r["source"]): r for r in batch_res}
    assert set(s) == set(b), (
        f"window-key sets differ: only-stream={sorted(set(s) - set(b))[:3]} "
        f"only-batch={sorted(set(b) - set(s))[:3]}"
    )
    for k in s:
        assert s[k]["count_events"] == b[k]["count_events"], k
        assert math.isclose(s[k]["sum_metric"], b[k]["sum_metric"], rel_tol=1e-9), k
        assert math.isclose(s[k]["avg_metric"], b[k]["avg_metric"], rel_tol=1e-9), k
        assert math.isclose(s[k]["error_rate"], b[k]["error_rate"], rel_tol=1e-9), k
        assert math.isclose(s[k]["p95_metric"], b[k]["p95_metric"], rel_tol=0.05), k
