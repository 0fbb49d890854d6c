"""Hierarchy / graph operators (SURVEY.md §2.7 G1-G9, J6).

The reference materializes category ancestor paths by walking
``parent_url`` pointers in Python with a per-miss DB query
(reference postgres_storage.py:487-562, ≤10 hops, cycle-guarded).
Here the same fixpoint is an **iterative DataFrame self-join loop**:

- state row per anchor category: (anchor_url, path[], next_parent,
  visited[]);
- each iteration joins active rows to the category dim on
  ``next_parent = url`` and prepends the parent name;
- cycle guard: stop (don't extend) when the parent is already in
  ``visited`` — port of the reference's visited-set;
- hop cap 10 (``len(visited) < 10``) — port of the depth guard.

Scale: category dims are bounded (thousands-to-millions of rows, not
TBs), so the parent side is broadcast each iteration — no shuffle at
all; the loop runs ≤9 joins. ``localCheckpoint`` every few
iterations cuts the growing lineage (risk register SURVEY §7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

MAX_HOPS = 10  # reference postgres_storage.py:498-507 depth guard


def ancestor_paths(
    categories: DataFrame,
    checkpoint_every: int = 3,
    check_early_exit: bool = True,
) -> DataFrame:
    """G1 — materialize root→node name paths for every category.

    Returns (url, path array<string>) where path[0] is the highest
    reachable ancestor's name (the root when the chain is intact;
    the last known node for orphans; the walk stops on cycles).

    The frontier-drained check (``check_early_exit``) only runs right
    after an eager checkpoint, where it costs a local scan of the
    materialized state instead of a plan re-execution — shallow
    hierarchies exit after the first checkpoint instead of running
    all ``MAX_HOPS`` joins.
    """
    parents = F.broadcast(
        categories.select(
            F.col("url").alias("p_url"),
            F.col("name").alias("p_name"),
            F.col("parent_url").alias("p_parent"),
        )
    )
    state = categories.select(
        F.col("url").alias("anchor_url"),
        F.array(F.col("name")).alias("path"),
        F.col("parent_url").alias("next_parent"),
        F.array(F.col("url")).alias("visited"),
    )
    # len(visited) starts at 1 and grows by 1 per hop → MAX_HOPS-1 joins.
    # One LEFT join per iteration: rows whose walk has ended carry
    # next_parent = NULL, which matches no parent row and passes
    # through unchanged — `state` is referenced exactly once per
    # iteration, so the logical plan grows linearly (a done/active
    # filter+union would reference it twice and double the plan per
    # hop: 2^9 subtrees for Catalyst to analyze).
    for i in range(MAX_HOPS - 1):
        joined = state.join(parents, F.col("next_parent") == F.col("p_url"), "left")
        stop = F.col("p_url").isNull() | F.array_contains(
            F.col("visited"), F.col("p_url")
        )
        state = joined.select(
            "anchor_url",
            F.when(stop, F.col("path"))
            .otherwise(F.concat(F.array(F.col("p_name")), F.col("path")))
            .alias("path"),
            F.when(stop, F.lit(None).cast("string"))
            .otherwise(F.col("p_parent"))
            .alias("next_parent"),
            F.when(stop, F.col("visited"))
            .otherwise(F.concat(F.col("visited"), F.array(F.col("p_url"))))
            .alias("visited"),
        )
        if (i + 1) % checkpoint_every == 0:
            # eager: truncate lineage AND analysis cost mid-loop
            state = state.localCheckpoint(eager=True)
            # frontier check piggybacks on the (already materialized)
            # checkpoint — an isEmpty here costs one cheap local scan,
            # not a plan re-execution, so shallow hierarchies exit
            # after the first checkpoint instead of running all hops.
            if check_early_exit and state.filter(
                F.col("next_parent").isNotNull()
            ).isEmpty():
                break
    return state.select(F.col("anchor_url").alias("url"), "path")


def bfs_descendants(
    categories: DataFrame,
    root_urls: list[str] | None = None,
    max_level: int = 3,
    eager: bool | None = None,
) -> DataFrame:
    """S11 — level-by-level BFS discovery from a root set (reference
    crawl_categories_optimized.py:303-428: per-level frontier queue,
    visited-set, ``max_level`` cap). Batch twin: the frontier is a
    DataFrame; each level is one join ``parent_url = frontier.url``
    plus an anti-join against the visited set; a node discovered
    through several parents — or re-reachable through a cycle — is
    kept at its FIRST (minimum) level, exactly the visited-set
    semantics of the crawl.

    Output: (url, name, level). Category dims are bounded, so the
    frontier side broadcasts; the per-level ``count()`` is the
    frontier-empty check the reference's queue loop does natively.

    ``root_urls=None`` roots the scan at parentless nodes with a
    filter instead of a driver-side collected list.

    Two physical strategies (``eager`` defaults to ``max_level > 3``):

    - **eager** (deep traversals): per-level distinct + anti-join
      against the visited set, checkpointed each hop with an
      early-exit at the fixpoint — the visited set is what keeps a
      deep frontier from re-expanding at 100 TB.
    - **lazy** (shallow caps): no per-level dedup at all — the level
      cap bounds any revisit fan-out, so the whole traversal is one
      declarative plan (level joins + a final min-level aggregate,
      the visited-set "first discovery wins" semantics as a groupBy)
      and runs as one job instead of 2·level tiny ones.
    """
    if eager is None:
        eager = max_level > 3
    edges = categories.select("url", "name", "parent_url")
    is_root = (
        F.col("parent_url").isNull()
        if root_urls is None
        else F.col("url").isin(root_urls)
    )
    frontier = edges.filter(is_root).select("url", "name", F.lit(0).alias("level"))
    out = frontier
    if not eager:
        for lvl in range(1, max_level + 1):
            frontier = edges.join(
                F.broadcast(frontier.select(F.col("url").alias("_purl"))),
                edges.parent_url == F.col("_purl"),
            ).select("url", "name", F.lit(lvl).alias("level"))
            out = out.unionByName(frontier)
        return out.groupBy("url", "name").agg(
            F.min("level").cast("int").alias("level")
        )
    for lvl in range(1, max_level + 1):
        children = (
            edges.join(
                F.broadcast(frontier.select(F.col("url").alias("_purl"))),
                edges.parent_url == F.col("_purl"),
            )
            .select("url", "name", F.lit(lvl).alias("level"))
            .distinct()
        )
        # only the new frontier is checkpointed (one eager job per
        # level — it feeds the emptiness check, the union AND the next
        # join); the accumulated output is a union of checkpointed
        # pieces, so its plan stays shallow without its own checkpoint
        new = children.join(
            out.select("url"), "url", "left_anti"
        ).localCheckpoint()
        if new.isEmpty():
            break
        out = out.unionByName(new)
        frontier = new
    return out


def with_level_pivot(paths: DataFrame, max_levels: int = 5) -> DataFrame:
    """G5 — level_1..level_N pivot + level + root name
    (reference postgres_storage.py:726-753)."""
    out = paths.select(
        "url",
        "path",
        F.size("path").alias("level"),
        # try_element_at: ANSI mode makes element_at throw past the end;
        # levels beyond the path depth must be NULL (reference level_1..5).
        F.try_element_at("path", F.lit(1)).alias("root_category_name"),
        *[
            F.try_element_at("path", F.lit(i)).alias(f"level_{i}")
            for i in range(1, max_levels + 1)
        ],
    )
    return out


def with_leaf_flag(categories: DataFrame) -> DataFrame:
    """J6 — is_leaf = url never referenced as someone's parent_url
    (reference postgres_storage.py:481,588-589)."""
    parent_urls = (
        categories.filter(F.col("parent_url").isNotNull())
        .select(F.col("parent_url").alias("_pu"))
        .distinct()
    )
    return (
        categories.join(
            F.broadcast(parent_urls), F.col("url") == F.col("_pu"), "left"
        )
        .withColumn("is_leaf", F.col("_pu").isNull())
        .drop("_pu")
    )


def missing_parents(categories: DataFrame) -> DataFrame:
    """G7/D4 — parent_urls referenced but absent from the table
    (reference tasks/loader.py:62-74)."""
    referenced = (
        categories.filter(F.col("parent_url").isNotNull())
        .select(F.col("parent_url").alias("missing_parent_url"))
        .distinct()
    )
    return referenced.join(
        categories.select(F.col("url")).distinct(),
        F.col("missing_parent_url") == F.col("url"),
        "left_anti",
    )


def repair_paths(
    paths: DataFrame, known_roots: DataFrame, default_root: str = "Root", max_len: int = 5
) -> DataFrame:
    """G6 — ensure a known root at index 0, truncate to ``max_len``
    (reference validate_category_path.py:24-124: prepend fallback
    root when the chain didn't reach one, cap at 5 elements)."""
    roots = F.broadcast(
        known_roots.select(F.col("name").alias("_root_name")).distinct()
    )
    joined = paths.join(
        # try_element_at: ANSI mode makes element_at THROW on an empty
        # path array (same reason with_level_pivot uses it)
        roots, F.try_element_at("path", F.lit(1)) == F.col("_root_name"), "left"
    )
    repaired = F.when(F.col("_root_name").isNotNull(), F.col("path")).otherwise(
        F.concat(F.array(F.lit(default_root)), F.col("path"))
    )
    return joined.select(
        "url", F.slice(repaired, 1, max_len).alias("repaired_path")
    )


def level_distribution(paths: DataFrame) -> DataFrame:
    """G9 — node count per path depth
    (reference build_category_hierarchy.py:127-134)."""
    return paths.groupBy(F.size("path").alias("level")).agg(
        F.count(F.lit(1)).alias("n_categories")
    )


def flatten_tree(spark, tree_json: str, max_depth: int = 5) -> DataFrame:
    """G3 — nested ``children[]`` JSON → flat (url, name, parent_url,
    level) rows (reference extract_categories.py:30-74).

    The tree depth is bounded (≤5 levels, reference config.py:17), so
    the recursive shape becomes a FIXED schema of ``max_depth`` nested
    struct levels + one explode per level — fully declarative, no
    driver-side recursion over data.
    """
    from pyspark.sql import types as T

    def level_schema(depth: int) -> T.StructType:
        fields = [
            T.StructField("name", T.StringType()),
            T.StructField("url", T.StringType()),
        ]
        if depth > 1:
            fields.append(
                T.StructField("children", T.ArrayType(level_schema(depth - 1)))
            )
        return T.StructType(fields)

    schema = T.ArrayType(level_schema(max_depth))
    roots = (
        spark.range(1)
        .select(F.from_json(F.lit(tree_json), schema).alias("roots"))
        .select(F.explode("roots").alias("node"))
        .select(
            F.col("node.url").alias("url"),
            F.col("node.name").alias("name"),
            F.lit(None).cast("string").alias("parent_url"),
            F.lit(0).alias("level"),
            F.col("node.children").alias("_children"),
        )
    )
    out = roots.drop("_children")
    frontier = roots
    for depth in range(1, max_depth):
        has_children = "_children" in frontier.columns
        if not has_children:
            break
        children = frontier.filter(F.col("_children").isNotNull()).select(
            F.col("url").alias("parent_url"), F.explode("_children").alias("node")
        )
        nxt = children.select(
            F.col("node.url").alias("url"),
            F.col("node.name").alias("name"),
            "parent_url",
            F.lit(depth).alias("level"),
            *(
                [F.col("node.children").alias("_children")]
                if depth < max_depth - 1
                else []
            ),
        )
        out = out.unionByName(nxt.drop("_children") if "_children" in nxt.columns else nxt)
        frontier = nxt
    return out


def build_tree(categories: DataFrame) -> list[dict]:
    """G4 — flat rows → nested tree, roots = rows with no parent
    (reference build_category_tree.py:21-69). Children sorted by name
    recursively. Driver-side assembly: the tree is an OUTPUT ARTIFACT
    (a JSON file in the reference), not a distributed dataset — the
    collect here is the sink, bounded by the category dim size.
    """
    rows = categories.select("url", "name", "parent_url").collect()
    by_parent: dict[str | None, list] = {}
    for r in rows:
        by_parent.setdefault(r["parent_url"], []).append(r)

    def assemble(parent_url: str | None) -> list[dict]:
        nodes = []
        for r in sorted(by_parent.get(parent_url, []), key=lambda x: x["name"]):
            node = {"name": r["name"], "url": r["url"]}
            children = assemble(r["url"])
            if children:
                node["children"] = children
            nodes.append(node)
        return nodes

    return assemble(None)


def dedup_categories_keep_best(categories: DataFrame) -> DataFrame:
    """W5 — per category_id keep shortest URL, tie → longest name
    (reference postgres_storage.py:772-800)."""
    w = W.partitionBy("category_id").orderBy(
        F.length("url").asc(), F.length("name").desc(), F.col("url").asc()
    )
    return (
        categories.filter(F.col("category_id").isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
