"""Model-based property test for LogTable: a random sequence of
append / overwrite / merge / optimize / vacuum operations must keep the
table's visible row MULTISET equal to a plain-Python reference model,
and every retained historical version must replay exactly.

Kept intentionally small (each op is a real Spark job): a handful of
hypothesis-chosen sequences, short op lists, tiny frames — the value is
the INTERLEAVING coverage, not data volume.
"""

from __future__ import annotations

from collections import Counter

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from wod_ascii_to_parquet_spark_spark.sources.lakehouse import LogTable

_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.lists(st.integers(0, 9), min_size=1, max_size=3)),
        st.tuples(st.just("overwrite"), st.lists(st.integers(0, 9), min_size=1, max_size=3)),
        st.tuples(st.just("merge"), st.lists(st.integers(0, 9), min_size=1, max_size=3, unique=True)),
        st.tuples(st.just("optimize"), st.just([])),
        st.tuples(st.just("vacuum"), st.just([])),
        st.tuples(st.just("delete"), st.lists(st.integers(0, 9), min_size=1, max_size=3, unique=True)),
        st.tuples(st.just("update"), st.lists(st.integers(0, 9), min_size=1, max_size=3, unique=True)),
    ),
    min_size=2,
    max_size=6,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_OPS)
def test_logtable_matches_reference_model(spark, tmp_path_factory, ops):
    tmp = tmp_path_factory.mktemp("logtable_prop")
    t = LogTable(spark, str(tmp / "t"))

    def df_of(rows):
        return spark.createDataFrame(list(rows), "k bigint, v string")

    # reference model: MULTISET of (k, v) rows in the current snapshot,
    # plus the expected content of every committed version in order.
    model: Counter = Counter()
    history: list[Counter] = []

    for i, (op, keys) in enumerate(ops):
        rows = [(k, f"v{i}-{k}") for k in keys]
        if op == "append":
            t.write(df_of(rows), mode="append")
            model = model + Counter(rows)
            history.append(Counter(model))
        elif op == "overwrite":
            t.write(df_of(rows), mode="overwrite")
            model = Counter(rows)
            history.append(Counter(model))
        elif op == "merge":
            if t.latest_version() is None:
                t.write(df_of(rows), mode="overwrite")
                model = Counter(rows)
            else:
                t.merge(df_of(rows), key="k")
                # merge drops EVERY current row whose key collides, then
                # adds exactly one row per update key
                keep = Counter(
                    {r: c for r, c in model.items() if r[0] not in set(keys)}
                )
                model = keep + Counter(rows)
            history.append(Counter(model))
        elif op == "optimize":
            if t.latest_version() is not None:
                t.optimize(target_files=1)
                history.append(Counter(model))
        elif op == "delete":
            if t.latest_version() is not None:
                ks = ", ".join(str(k) for k in keys)
                t.delete_where(f"k IN ({ks})")
                new = Counter(
                    {r: c for r, c in model.items() if r[0] not in set(keys)}
                )
                if new != model:  # a no-match delete commits nothing
                    model = new
                    history.append(Counter(model))
        elif op == "update":
            if t.latest_version() is not None:
                ks = ", ".join(str(k) for k in keys)
                t.update_where(f"k IN ({ks})", {"v": "concat(v, '+')"})
                new = Counter()
                for (k, v), c in model.items():
                    new[(k, v + "+") if k in set(keys) else (k, v)] += c
                if new != model:  # a no-match update commits nothing
                    model = new
                    history.append(Counter(model))
        elif op == "vacuum":
            if t.latest_version() is not None:
                t.vacuum(keep_versions=1, min_age_seconds=0)
                history = history[-1:]

    if t.latest_version() is None:
        return  # sequence never committed anything

    got = Counter((r.k, r.v) for r in t.read().collect())
    assert got == model

    # every retained version replays exactly (aligned from the end)
    versions = t.versions()
    tail = min(len(versions), len(history))
    for v, expected in zip(versions[-tail:], history[-tail:]):
        snap = Counter((r.k, r.v) for r in t.read(version=v).collect())
        assert snap == expected, f"version {v} drifted"
