"""Bounded driver-side ln tables with an in-engine fallback.

The repo's determinism standard computes transcendentals (ln) on the
DRIVER over the distinct value domain and broadcast-joins the results:
CPython/glibc log is bitwise-equal to DuckDB's, while the JVM's Math.log
differs by 1 ulp on ~8% of inputs — enough to flip a quantization bucket
at a trunc boundary. That is sound while the domain is bounded (distinct
df values, distinct doc lengths), but at 10^12 documents a distinct-df
domain can reach 10^6-10^7 rows, and unbounded it becomes a driver-side
scale hazard (round-2 verdict watch item #3).

``capped_distinct`` enforces a hard cap: below it, callers build the
bitwise table as before; above it, they receive ``None`` and must fall
back to the in-engine ``F.log`` expression — forfeiting ONLY the bitwise
cross-engine oracle parity of that expression (values still agree to
1 ulp), and saying so loudly in the log.
"""

from __future__ import annotations

import logging
import os

LOG = logging.getLogger("jassv2_spark.lntable")

# Distinct-domain ceiling for driver-side ln tables. ~2M rows ≈ tens of
# MB collected + broadcast — comfortably a "tiny table" on any driver;
# beyond it the bitwise table stops being tiny and the fallback engages.
DEFAULT_MAX_DISTINCT = int(os.environ.get("JASS_LN_TABLE_MAX_DISTINCT", 2_000_000))


def capped_distinct(df, col: str, max_distinct: int | None = None) -> list | None:
    """Distinct values of ``col``, or ``None`` when they exceed the cap.

    The probe collects at most cap+1 rows (LIMIT pushes into the
    distinct aggregation — the overflow case never materializes the full
    domain on the driver)."""
    cap = DEFAULT_MAX_DISTINCT if max_distinct is None else int(max_distinct)
    rows = df.select(col).distinct().limit(cap + 1).collect()
    if len(rows) > cap:
        LOG.warning(
            "ln-table domain for %r exceeds %d distinct values; falling back "
            "to in-engine ln for this expression (1-ulp engine variance "
            "instead of bitwise oracle parity)",
            col,
            cap,
        )
        return None
    return [r[0] for r in rows]
