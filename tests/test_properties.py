"""Property-based tests (SURVEY §5.2.4) — pure-Python layers via hypothesis."""

from hypothesis import given, settings, strategies as st

from console_datagen_spark import config as C
from console_datagen_spark import naming
from console_datagen_spark.functions.rate import RATE_VALUES, rate_for_millis_py

keys = st.sampled_from(sorted(C.PRODUCER_KEYS | C.CONSUMER_KEYS | {"junk.key"}))
vals = st.text(
    alphabet=st.characters(whitelist_categories=("L", "N")), max_size=8
)


@given(st.integers(min_value=0, max_value=10**12))
def test_base36_roundtrip(n):
    assert int(naming.base36(n), 36) == n


@given(st.integers(min_value=0, max_value=10**6), st.integers(0, 2))
def test_topic_name_always_matches_pattern(g, t):
    name = naming.topic_name(g, "consumer", t)
    assert name.startswith("console_datagen_")
    assert name.endswith(f"consumer-{naming.topic_suffix(t)}")


@settings(max_examples=200)
@given(st.dictionaries(keys, vals, max_size=6), st.dictionaries(keys, vals, max_size=6))
def test_merge_override_and_legality(defaults, overrides):
    out = C.merge_client_config(defaults, overrides, C.PRODUCER_KEYS)
    for k, v in out.items():
        assert k in C.PRODUCER_KEYS  # never leaks illegal keys
        src = overrides.get(k, defaults.get(k))
        assert v == C.unquote(src)  # override wins, value unquoted
    # consumer variant never contains banned keys
    out_c = C.merge_client_config(
        defaults, overrides, C.CONSUMER_KEYS, C.BANNED_CONSUMER_KEYS
    )
    assert "group.id" not in out_c


@given(st.text(max_size=20))
def test_unquote_idempotent(s):
    assert C.unquote(C.unquote(s)) == C.unquote(s)


@given(st.integers(min_value=0, max_value=10**15))
def test_rate_law_range_and_period(ms):
    r = rate_for_millis_py(ms)
    assert r in RATE_VALUES
    # 50 s periodicity
    assert rate_for_millis_py(ms + 50_000) == r
    # constant within a 10 s plateau
    assert rate_for_millis_py((ms // 10000) * 10000) == r
