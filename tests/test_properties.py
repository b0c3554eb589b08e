"""Property-based checks (hypothesis, no Spark session needed) for the
pure-Python building blocks whose contracts the engine leans on:
random-access event generation (determinism, JSON contract, time-wrap
horizon, seed-lane separation), the serving window parser's totality,
HotStore's TTL semantics against a reference model, and fan_out's
channel dispatch table.
"""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(st.integers(0, 2**40), st.integers(0, 2**40), st.sampled_from([50, 200, 1000]))
def test_gen_event_deterministic_valid_and_addressable(seed, i, interval_ms):
    """gen_event(seed, i) is a pure function of (seed, i, interval_ms):
    byte-identical on re-call (the property that makes the synthetic
    connector's offset replay exactly-once), parses as the producer's
    JSON contract, and the event time advances linearly with i."""
    from real_time_event_streaming_analytics_platform_spark.sources.synthetic import (
        gen_event,
    )

    a = gen_event(seed, i, interval_ms)
    b = gen_event(seed, i, interval_ms)
    assert a == b
    d = json.loads(a)
    assert set(d) >= {"event_id", "source", "timestamp", "attributes"}
    attrs = d["attributes"]
    assert attrs["metric"] >= 0.0
    assert attrs["status"] in ("ok", "warning", "error")
    nxt = json.loads(gen_event(seed, i + 1, interval_ms))
    from datetime import datetime

    t0 = datetime.fromisoformat(d["timestamp"])
    t1 = datetime.fromisoformat(nxt["timestamp"])
    # linear advance except at the documented 100-year wrap boundary
    horizon_ms = 100 * 365 * 24 * 3600 * 1000
    if (i + 1) * interval_ms % horizon_ms > i * interval_ms % horizon_ms:
        assert (t1 - t0).total_seconds() * 1000 == interval_ms


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 2**40), st.integers(0, 2**20))
def test_gen_event_seed_lanes_do_not_collide(seed, i):
    """Adjacent seeds must produce different event streams at the same
    index — the sha512 string-seeding exists precisely because the old
    (seed << 32) | i mixing aliased lanes."""
    from real_time_event_streaming_analytics_platform_spark.sources.synthetic import (
        gen_event,
    )

    assert gen_event(seed, i) != gen_event(seed + 1, i)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=8))
def test_parse_window_total_function(w):
    """parse_window either returns the documented positive second count
    or raises ValueError — never returns garbage, never raises anything
    else (the serving API turns the ValueError into a 400)."""
    from real_time_event_streaming_analytics_platform_spark.serving.api import (
        WINDOW_SECONDS,
        parse_window,
    )

    try:
        out = parse_window(w)
    except ValueError:
        assert w not in WINDOW_SECONDS
    else:
        assert out == WINDOW_SECONDS[w] and out > 0


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.tuples(
                st.just("set"),
                st.sampled_from(["web", "mobile", "api"]),
                st.integers(0, 20),     # window_start bucket
                st.integers(1, 50),     # ttl seconds
            ),
            st.tuples(st.just("tick"), st.integers(1, 30)),
            st.tuples(st.just("purge")),
            st.tuples(st.just("kpi"), st.sampled_from(["web", None])),
        ),
        max_size=60,
    )
)
def test_hotstore_ttl_model(ops):
    """Randomized-op model check of HotStore against a reference dict
    under a fake clock: kpi never serves an expired entry, always
    serves every live matching entry (within limit), newest-first, and
    purge_expired removes exactly the dead keys."""
    from real_time_event_streaming_analytics_platform_spark.serving.hotstore import (
        HotStore,
    )

    clock = [1000.0]
    store = HotStore(now_fn=lambda: clock[0])
    model: dict[tuple, float] = {}  # key -> expiry

    for op in ops:
        if op[0] == "set":
            _, src, ws, ttl = op
            store.set(src, "1m", f"2024-01-01T00:{ws:02d}", {"count_events": ws}, ttl)
            model[(src, "1m", f"2024-01-01T00:{ws:02d}")] = clock[0] + ttl
        elif op[0] == "tick":
            clock[0] += op[1]
        elif op[0] == "purge":
            n = store.purge_expired()
            dead = [k for k, exp in model.items() if exp <= clock[0]]
            assert n == len(dead)
            for k in dead:
                del model[k]
        else:
            _, src = op
            got = {(r["source"], r["window"], r["window_start"]) for r in store.kpi(source=src)}
            live = {
                k
                for k, exp in model.items()
                if exp > clock[0] and (src is None or k[0] == src)
            }
            assert got == live  # < 100 entries, so limit never cuts
    # closing invariant: after a final purge, exactly the live keys
    # remain resident (lazy expiry never loses a live key and a purge
    # never retains a dead one)
    store.purge_expired()
    live_n = sum(1 for exp in model.values() if exp > clock[0])
    assert len(store) == live_n


@settings(max_examples=200, deadline=None)
@given(
    email=st.booleans(),
    recipients=st.lists(st.sampled_from(["a@x", "b@x", "c@x"]), max_size=3),
    slack=st.booleans(),
    slack_url=st.one_of(st.none(), st.just("https://hooks.example/T1")),
    webhook=st.booleans(),
    hooks=st.lists(st.sampled_from(["https://h1.example", "https://h2.example"]), max_size=2),
    severity=st.sampled_from(["info", "warning", "critical"]),
    source=st.sampled_from(["web", "mobile", "api"]),
)
def test_fan_out_message_contract(
    email, recipients, slack, slack_url, webhook, hooks, severity, source
):
    """For every config combination, fan_out emits exactly the enabled+
    configured channels (the reference's dispatch table), and every
    message carries the fields the transports and the done-marker
    accounting rely on (channel, alert_id)."""
    from real_time_event_streaming_analytics_platform_spark.streaming.notify import (
        NotifierConfig,
        fan_out,
    )

    alert = {
        "event_id": "evt-1",
        "source": source,
        "severity": severity,
        "ts": "2024-01-01T00:00:00+00:00",
        "value": 123.4,
    }
    cfg = NotifierConfig(
        email_enabled=email,
        email_recipients=recipients,
        slack_enabled=slack,
        slack_webhook_url=slack_url,
        webhook_enabled=webhook,
        custom_webhooks=hooks,
    )
    msgs = fan_out(alert, cfg)
    want = (
        (1 if email and recipients else 0)
        + (1 if slack and slack_url else 0)
        + (len(hooks) if webhook else 0)
    )
    assert len(msgs) == want
    for m in msgs:
        assert m["channel"] in ("email", "slack", "webhook")
        assert m["alert_id"] == "evt-1"
    by_channel = [m["channel"] for m in msgs]
    assert by_channel.count("email") == (1 if email and recipients else 0)
    assert by_channel.count("slack") == (1 if slack and slack_url else 0)
    assert by_channel.count("webhook") == (len(hooks) if webhook else 0)
