"""Exact decimal arithmetic helpers for oracle-checked aggregates.

Money/quantity/discount columns in the test tables are exact at 2
decimals (verified: max |x·100 − round(x·100)| < 4e-9), but DERIVED
values — averages and discount products — land on exact half-way
decimals (e.g. AVG of two orders = 141428.955), and float ROUND of a
half-way double is engine-dependent (Spark BigDecimal-half-up vs
DuckDB multiply-and-rint). Any such query would be a coin-flip in the
correctness gate.

Fix: do the arithmetic in integer space —

- ``cents(x)``       = round(x·100)  as BIGINT (2-decimal domain)
- ``hundredths(x)``  = round(x·100)  as BIGINT (for 0.00-1.00 rates)
- half-up rounding of num/den = ``(2·num + den) div (2·den)`` for
  positive values — exact in both engines (Spark ``div``, DuckDB
  ``//``).

Scale note: integer unit sums overflow BIGINT around 9.2e18 — at
extreme scale switch the sum to DECIMAL(38,0); the div-round identity
is unchanged.

Spark-side helpers return Columns / SQL-expr strings (integer ``div``
needs named columns, so finishing expressions run via ``F.expr``);
oracle-side helpers return DuckDB SQL strings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# ---------------------------------------------------------------- Spark side

def cents(col: Column) -> Column:
    """Exact integer cents of a 2-decimal money double."""
    return F.round(col * 100, 0).cast("bigint")


def hundredths(col: Column) -> Column:
    """Exact integer hundredths of a 2-decimal rate double."""
    return F.round(col * 100, 0).cast("bigint")


def ints(col: Column) -> Column:
    """Exact integer of an integer-valued double (quantities)."""
    return F.round(col, 0).cast("bigint")


def div_round_expr(num: str, den: str, scale_down: int) -> str:
    """SQL expr: half-up(num/den) / scale_down as DOUBLE.

    ``num``/``den`` are SQL sub-expressions over named columns;
    ``scale_down`` converts the integer result back to a decimal
    (100 → 2dp output, 10000 → 4dp output).
    """
    return (
        f"CAST((({num}) * 2 + ({den})) div (2 * ({den})) AS DOUBLE) / {scale_down}.0"
    )


# ---------------------------------------------------------------- oracle side

def o_cents(col: str) -> str:
    return f"CAST(ROUND({col} * 100) AS BIGINT)"


def o_hundredths(col: str) -> str:
    return f"CAST(ROUND({col} * 100) AS BIGINT)"


def o_ints(col: str) -> str:
    return f"CAST(ROUND({col}) AS BIGINT)"


def o_div_round(num: str, den: str, scale_down: int) -> str:
    return (
        f"CAST((({num}) * 2 + ({den})) // (2 * ({den})) AS DOUBLE) / {scale_down}.0"
    )


# Common derived fragments -------------------------------------------------

def o_avg_money_2dp(col: str) -> str:
    """ROUND(AVG(money), 2) with exact half-up rounding."""
    return o_div_round(f"SUM({o_cents(col)})", "COUNT(*)", 100)


def o_avg_int_2dp(col: str) -> str:
    """ROUND(AVG(integer-valued), 2) exactly."""
    return o_div_round(f"SUM({o_ints(col)}) * 100", "COUNT(*)", 100)


def o_avg_rate_4dp(col: str) -> str:
    """ROUND(AVG(2-decimal rate), 4) exactly."""
    return o_div_round(f"SUM({o_hundredths(col)}) * 100", "COUNT(*)", 10000)
