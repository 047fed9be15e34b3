"""Statistical scalar helpers emitted as portable SQL.

The rank/ANOVA/KS batteries in plans/ deliberately output TEST
STATISTICS (z, U, H, D) rather than p-values, dodging the engine
question of a normal CDF. The helpers here close that gap for queries
that genuinely need tail probabilities (Benjamini-Hochberg FDR):
the Abramowitz & Stegun 7.1.26 erf approximation (max abs error
1.5e-7, a published constant table) emitted as ONE literal tree shared
verbatim by Spark and DuckDB — so cross-engine parity is exact even
though the approximation itself is only 7-digit accurate (quantize
p-value outputs at 1e-6, comfortably above the approximation noise
only when used as DECISIONS; for reported p columns round at 1e-6 and
treat the value as the A&S approximation by definition, which both
engines compute identically).
"""

from __future__ import annotations

from cioos_siooc_data_transform_spark.functions.teos10 import _lit

# Abramowitz & Stegun 7.1.26 coefficients (published).
_AS_P = 0.3275911
_AS_A = [0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429]


def erf_as_sql(x: str) -> str:
    """erf(x) for x >= 0 via A&S 7.1.26: 1 − (Σ a_i t^i)·exp(−x²),
    t = 1/(1 + p·x). Callers must pass a non-negative expression
    (wrap with abs() and re-apply the sign if needed)."""
    t = f"(1.0e0/(1.0e0 + {_lit(_AS_P)}*({x})))"
    poly = _lit(_AS_A[-1])
    for c in reversed(_AS_A[:-1]):
        poly = f"({_lit(c)} + {t}*{poly})"
    return f"(1.0e0 - {t}*{poly}*exp(-({x})*({x})))"


def normal_two_sided_p_sql(z: str) -> str:
    """Two-sided normal p-value 2·P(Z > |z|) = 1 − erf(|z|/√2)
    (A&S-approximate, identical literal tree on both engines)."""
    xa = f"(abs({z})*{_lit(1.0 / 2.0 ** 0.5)})"
    return f"(1.0e0 - {erf_as_sql(xa)})"
