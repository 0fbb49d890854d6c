"""Property-based tests (hypothesis) for the scalar parse functions —
the testing depth SURVEY §5 notes the reference lacks.

Spark calls are batched: hypothesis generates PYTHON inputs, the
whole case list runs as ONE DataFrame job per property against the
pure-Python expected values.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tiki_data_pipeline_spark.functions import scalars as S
from tiki_data_pipeline_spark.functions.urls import canonicalize_url


def _batch_eval(spark, fn, cases: list[str]):
    df = spark.createDataFrame([(c,) for c in cases], "raw string")
    return [r["out"] for r in df.select(fn(F.col("raw")).alias("out")).collect()]


def test_parse_sales_count_property(spark):
    import random

    rng = random.Random(7)
    cases, expected = [], []
    for _ in range(300):
        n = rng.randrange(0, 10_000)
        frac = rng.choice(["", f".{rng.randrange(1, 10)}"])
        suffix = rng.choice(["", "k", "m", "K", "M"])
        pad = rng.choice(["", " ", "đã bán "])
        raw = f"{pad}{n}{frac}{suffix}"
        mult = {"": 1, "k": 1000, "m": 1000000}[suffix.lower()]
        # half-up like Spark's ROUND — python round() is banker's
        import math

        want = math.floor(float(f"{n}{frac}") * mult + 0.5)
        cases.append(raw)
        expected.append(want)
    got = _batch_eval(spark, S.parse_sales_count, cases)
    assert got == expected


def test_parse_price_property(spark):
    import random

    rng = random.Random(11)
    cases, expected = [], []
    for _ in range(300):
        n = rng.randrange(0, 10**9)
        s = f"{n:,}".replace(",", rng.choice([".", ","]))
        raw = s + rng.choice(["₫", " đ", "", " VND"])
        cases.append(raw)
        expected.append(n)
    got = _batch_eval(spark, S.parse_price, cases)
    assert got == expected


@settings(max_examples=200, deadline=None)
@given(
    st.text(
        alphabet=st.characters(
            whitelist_categories=["Ll", "Lu", "Nd"], whitelist_characters=":/?&=._-"
        ),
        min_size=1,
        max_size=60,
    )
)
def test_canonicalize_is_idempotent(raw):
    url = "https://tiki.vn/" + raw
    once = canonicalize_url(url)
    assert once is not None
    assert canonicalize_url(once) == once


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=10**7), st.sampled_from(["", "k", "m"]))
def test_parse_sales_pure_python_model(n, suffix):
    """The regex model agrees with exact integer math inside the
    operator's documented domain (crawl counts ≤ 10⁷ — beyond ~2^53
    the float multiply would drift, which is out of scope)."""
    raw = f"{n}{suffix}"
    m = re.search(r"([0-9]+(?:[.,][0-9]+)?)\s*([km]?)", raw.lower())
    assert m is not None
    mult = {"": 1, "k": 1000, "m": 1000000}[m.group(2)]
    want = round(float(m.group(1).replace(",", ".")) * mult)
    assert want == n * mult


def test_transform_invariants(spark):
    """Transform output invariants: unique keys, typed columns
    non-negative, validity rules hold."""
    from tiki_data_pipeline_spark import fixtures as FX
    from tiki_data_pipeline_spark import transform as TR

    out = TR.transform_products(FX.raw_products_df(spark))
    rows = out.collect()
    ids = [r["product_id"] for r in rows]
    assert len(ids) == len(set(ids))
    for r in rows:
        assert r["price"] > 0
        assert r["original_price"] is None or r["price"] <= r["original_price"]
        assert r["rating_average"] is None or 0 <= r["rating_average"] <= 5
        assert r["url"].startswith("http")
        assert re.fullmatch(r"[0-9]+", r["product_id"])


@given(st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_clean_and_short_name_totality(raw):
    """The name cleaners are total over arbitrary text: None or a
    non-empty string, and short_name never exceeds the reference's
    80-char hard-fallback bound."""
    from tiki_data_pipeline_spark.functions.text import clean_name, short_name

    c = clean_name(raw)
    assert c is None or (isinstance(c, str) and c)
    s = short_name(raw)
    assert s is None or (isinstance(s, str) and len(s) <= 80)


_json_values = st.recursive(
    st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-10**6, max_value=10**6),
        st.text(max_size=10),
    ),
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(
            st.sampled_from(
                ["products", "items", "data", "props", "pageProps",
                 "initialState", "id", "name", "price", "x"]
            ),
            children,
            max_size=4,
        ),
    ),
    max_leaves=25,
)


@given(_json_values)
@settings(max_examples=200, deadline=None)
def test_find_product_list_total_over_arbitrary_json(obj):
    """The recursive descent terminates on arbitrary JSON-shaped data
    and returns None or a list (never a scalar, never raises)."""
    from tiki_data_pipeline_spark.operators.json_search import find_product_list

    out = find_product_list(obj)
    assert out is None or isinstance(out, list)


def test_ancestor_paths_matches_walk_model_on_adversarial_graphs(spark):
    """G1/G2 closure over 250 randomized parent graphs — self-loops,
    cycles, diamond DAGs, forests, dangling parent pointers — must
    equal the reference walk semantics exactly (visited-set guard,
    MAX_HOPS cap, orphan keeps its own name). All graphs run as ONE
    Spark job: urls are namespaced per graph and unioned."""
    import random

    from tiki_data_pipeline_spark.operators.hierarchy import (
        MAX_HOPS,
        ancestor_paths,
    )

    def model_path(url, nodes):
        name, nxt = nodes[url]
        path, visited = [name], {url}
        for _ in range(MAX_HOPS - 1):
            if nxt is None or nxt not in nodes or nxt in visited:
                break
            pname, pparent = nodes[nxt]
            path.insert(0, pname)
            visited.add(nxt)
            nxt = pparent
        return path

    rows, expected = [], {}
    for seed in range(250):
        rng = random.Random(seed)
        n = rng.randrange(1, 20)
        urls = [f"g{seed}-c{i}" for i in range(n)]
        nodes = {}
        for i, u in enumerate(urls):
            roll = rng.random()
            if roll < 0.2:
                parent = None                        # root
            elif roll < 0.8:
                parent = rng.choice(urls)            # incl. self-loops,
            else:                                    # cycles, diamonds
                parent = f"g{seed}-missing{rng.randrange(3)}"  # dangling
            nodes[u] = (f"name-{seed}-{i}", parent)
        # a guaranteed deep chain so MAX_HOPS actually binds sometimes
        if n >= 12 and rng.random() < 0.5:
            for i in range(1, 13):
                if i < n:
                    nodes[urls[i]] = (nodes[urls[i]][0], urls[i - 1])
        for u, (name, parent) in nodes.items():
            rows.append((u, name, parent))
        for u in urls:
            expected[u] = model_path(u, nodes)

    cats = spark.createDataFrame(
        rows, schema="url string, name string, parent_url string"
    )
    got = {
        r["url"]: list(r["path"])
        for r in ancestor_paths(cats).collect()
    }
    assert len(got) == len(expected)
    diffs = {u: (got[u], expected[u]) for u in expected if got[u] != expected[u]}
    assert not diffs, f"{len(diffs)} mismatches; first: {list(diffs.items())[:3]}"
    assert all(len(p) <= MAX_HOPS for p in got.values())


def test_scalar_parse_cross_engine_fuzz(spark):
    """Fuzz the scalar parsers across both engines: 300 seeded-random
    dirty strings (digit runs, separators, currency marks, k/m
    suffixes, signs, unicode junk, timestamps) must parse to EXACTLY
    the same values in Spark and DuckDB — this is the surface the
    transform oracles stand on, so any regex/locale divergence between
    the engines must surface here, not in a driver hash mismatch."""
    import random

    import duckdb

    from pyspark.sql import functions as F
    from tiki_data_pipeline_spark.fixtures import sql_literal
    from tiki_data_pipeline_spark.functions import scalars as SC

    rng = random.Random(20260814)
    digits = "0123456789"
    junk = ["₫", "đ", " ", ".", ",", "-", "+", "k", "m", "K", "M", "vnd", "VND",
            "~", "x", "❤", "\t", "Đã bán ", "price:", ""]

    def rand_price():
        n = rng.randint(1, 9)
        s = "".join(rng.choice(digits) for _ in range(n))
        for _ in range(rng.randint(0, 4)):
            pos = rng.randint(0, len(s))
            s = s[:pos] + rng.choice(junk) + s[pos:]
        return s

    def rand_ts():
        y, mo, d = rng.randint(1990, 2030), rng.randint(0, 13), rng.randint(0, 32)
        h, mi, se = rng.randint(0, 24), rng.randint(0, 60), rng.randint(0, 60)
        sep = rng.choice(["T", " "])
        frac = rng.choice(["", f".{rng.randint(0, 999999):06d}"])
        form = rng.choice([
            f"{y:04d}-{mo:02d}-{d:02d}{sep}{h:02d}:{mi:02d}:{se:02d}{frac}",
            f"{y:04d}-{mo:02d}-{d:02d}",
            rand_price(),  # garbage: must be NULL in both engines
        ])
        return form

    cases = [(i, rand_price(), rand_ts()) for i in range(300)]

    sdf = spark.createDataFrame(cases, "case_id long, raw string, ts_raw string")
    got = {
        r["case_id"]: (r["p"], r["s"], r["t"])
        for r in sdf.select(
            "case_id",
            SC.parse_price(F.col("raw")).alias("p"),
            SC.parse_sales_count(F.col("raw")).alias("s"),
            F.date_format(SC.parse_datetime(F.col("ts_raw")), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("t"),
        ).collect()
    }

    vals = ",".join(
        f"({i}, {sql_literal(p)}, {sql_literal(t)})" for i, p, t in cases
    )
    con = duckdb.connect()
    rows = con.execute(f"""
        SELECT case_id,
          TRY_CAST(NULLIF(REGEXP_REPLACE(raw, '[^0-9]', '', 'g'), '') AS BIGINT),
          TRY_CAST(ROUND(
            TRY_CAST(NULLIF(REPLACE(REGEXP_EXTRACT(LOWER(TRIM(raw)),
                '([0-9]+(?:[.,][0-9]+)?)\\s*([km]?)', 1), ',', '.'), '') AS DOUBLE)
            * (CASE REGEXP_EXTRACT(LOWER(TRIM(raw)),
                '([0-9]+(?:[.,][0-9]+)?)\\s*([km]?)', 2)
               WHEN 'k' THEN 1000.0 WHEN 'm' THEN 1000000.0 ELSE 1.0 END)
          ) AS BIGINT),
          strftime(COALESCE(
            TRY_STRPTIME(ts_raw, '%Y-%m-%d %H:%M:%S'),
            TRY_STRPTIME(ts_raw, '%Y-%m-%dT%H:%M:%S'),
            TRY_STRPTIME(ts_raw, '%Y-%m-%dT%H:%M:%S.%f'),
            TRY_STRPTIME(ts_raw, '%Y-%m-%d %H:%M:%S.%f'),
            TRY_STRPTIME(ts_raw, '%Y-%m-%d')), '%Y-%m-%d %H:%M:%S.%f')
        FROM (VALUES {vals}) AS t(case_id, raw, ts_raw)
    """).fetchall()
    want = {r[0]: (r[1], r[2], r[3]) for r in rows}

    diffs = {i: (got[i], want[i]) for i in got if got[i] != want[i]}
    assert not diffs, f"{len(diffs)} cross-engine divergences, e.g. {list(diffs.items())[:5]}"
