"""Driver contract for the spark-graft builder (PySpark target).

entry() runs the flagship HLL query; queries()/oracle_sql() expose every
implemented operator (SURVEY.md §2). Approximate sketch queries without an
exact SQL equivalent intentionally omit oracle entries (rows-only check);
their *accuracy companions* (``*_accuracy``) ARE oracle-checked: they emit the
exact count plus a within-bound boolean the sketch must satisfy.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sketchlib import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: HLL distinct tokens per source on the canonical sequences

    table at tiny scale (deterministic synth per FIXTURES.md §1)."""
    return Q.hll_tokens_per_source(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # approximate sketch queries (rows-only driver check)
        "hll_tokens_per_source": Q.hll_tokens_per_source,
        "hll_tokens_global": Q.hll_tokens_global,
        "hll_users_per_event_type": Q.hll_users_per_event_type,
        # oracle-checked: exact values + sketch-bound assertions
        "hll_users_accuracy": Q.hll_users_accuracy,
        "hll_parts_accuracy": Q.hll_parts_accuracy,
        "exact_distinct_parts_per_returnflag": Q.exact_distinct_parts_per_returnflag,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "hll_users_accuracy": """
            SELECT event_type,
                   COUNT(DISTINCT user_id) AS exact_users,
                   TRUE AS within_3sigma
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "hll_parts_accuracy": """
            SELECT l_returnflag,
                   COUNT(DISTINCT l_partkey) AS distinct_parts,
                   TRUE AS within_3sigma
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "exact_distinct_parts_per_returnflag": """
            SELECT l_returnflag,
                   COUNT(DISTINCT l_partkey) AS distinct_parts
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
    }
