"""Job-accounting scalar expressions (SURVEY §2.8 F9-F12).

Reference provenance:
  * jobID standardize, step-1 variant — transform_conte_ts_data.py:263
    (case-insensitive ``jobID`` → ``JOB`` string replace).
  * jobID standardize, step-2 variant — conte-etl-step-2-processor.py:
    496-507 (``'JOB' + first digit run``).
  * walltime → seconds — conte-etl-step-2-processor.py:224-276.
  * exec_host → host list — conte-etl-step-2-processor.py:566-616.
  * exitcode CASE — conte-etl-step-2-processor.py:279-333.

Deviation (documented): the reference builds host_list from a Python
``set`` (iteration order nondeterministic across runs,
conte-etl-step-2-processor.py:609); we canonicalize with a sort so output
is deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from conte_to_fresco_etl_spark.functions.core import _col


#: Accounting datetime formats tried in order (the reference parses these
#: columns with pandas free-format ``pd.to_datetime(errors='coerce')``,
#: conte-etl-step-2-processor.py:1219-1221; raw PBS dumps use
#: MM/DD/YYYY HH:MM:SS while restaged CSVs use ISO).
_ACCT_TS_FORMATS = [
    "MM/dd/yyyy HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd",
]


def parse_acct_timestamp(c: Column | str) -> Column:
    """Free-format datetime parse, null on failure (S2/F8 semantics,
    conte-etl-step-2-processor.py:1219-1221).  Tries each known PBS/ISO
    format; ``try_to_timestamp`` keeps every branch ANSI-safe."""
    c = _col(c)
    return F.coalesce(
        *[F.try_to_timestamp(c, F.lit(fmt)) for fmt in _ACCT_TS_FORMATS],
        F.try_to_timestamp(c),
    )


def std_job_id_replace(c: Column | str) -> Column:
    """Step-1 normalization: replace a case-insensitive ``jobID`` prefix
    with ``JOB`` (transform_conte_ts_data.py:263)."""
    return F.regexp_replace(_col(c), r"(?i)jobID", "JOB")


def std_job_id_extract(c: Column | str) -> Column:
    """Step-2 normalization: ``JOB`` + first digit run; values without
    digits pass through unchanged (conte-etl-step-2-processor.py:496-507).

    Handles ``jobID123456``, ``123456.conte-adm``, ``123456`` alike.
    """
    c = _col(c)
    digits = F.regexp_extract(c, r"(\d+)", 1)
    return F.when(digits != "", F.concat(F.lit("JOB"), digits)).otherwise(c)


def walltime_seconds(c: Column | str) -> Column:
    """Walltime → seconds (conte-etl-step-2-processor.py:224-276).

    Numeric string → float passthrough; ``HH:MM:SS`` → h*3600+m*60+s;
    ``MM:SS`` → m*60+s; anything else → NULL.
    """
    c = _col(c)
    parts = F.split(c, ":")
    n = F.size(parts)
    # try_cast: garbage components -> NULL (pandas errors='coerce' parity;
    # also ANSI-mode-safe under Spark 4 defaults).
    h, m, s = (parts.getItem(i).try_cast("double") for i in range(3))
    m2, s2 = (parts.getItem(0).try_cast("double"),
              parts.getItem(1).try_cast("double"))
    return (
        F.when(c.rlike(r"^\d+(\.\d+)?$"), c.try_cast("double"))
        .when((n == 3), h * 3600.0 + m * 60.0 + s)
        .when((n == 2), m2 * 60.0 + s2)
        .otherwise(F.lit(None).cast("double"))
    )


def host_list_array(exec_host: Column | str) -> Column:
    """Distinct, sorted host names from a PBS ``exec_host`` string such as
    ``conte-a084/0+conte-a084/1+conte-a085/0``
    (parse_host_list, conte-etl-step-2-processor.py:566-616)."""
    c = _col(exec_host)
    hosts = F.regexp_extract_all(c, F.lit(r"([^/+]+)/"), 1)
    return F.array_sort(F.array_distinct(hosts))


def host_list_string(exec_host: Column | str) -> Column:
    """The reference's ``{a,b}`` formatting of the host set
    (json.dumps(list(set(...))).replace('\"','') at
    conte-etl-step-2-processor.py:609), deterministically sorted."""
    arr = host_list_array(exec_host)
    return F.concat(F.lit("{"), F.array_join(arr, ","), F.lit("}"))


def exitcode_case(jobevent: Column | str, exit_status: Column | str) -> Column:
    """PBS job-event → exitcode label (conte-etl-step-2-processor.py:279-333).

    ``E``/0 → COMPLETED; ``E``/nonzero → ``FAILED:<code>``; ``A`` →
    ABORTED; ``S`` → STARTED; ``Q`` → QUEUED; else ``<jobevent>:<status>``.

    NULL inputs are coalesced to ``''`` first, matching the reference's
    ``fillna('')`` on BOTH columns (processor:299-300): ``('E', NULL)``
    → ``FAILED:``, and the fallback is always ``<event>:<status>`` with
    the colon kept (``jobevent + ':' + exit_status``, :327-330), so
    ``(NULL, NULL)`` → ``':'``.
    """
    ev = F.coalesce(_col(jobevent), F.lit(""))
    st = F.coalesce(_col(exit_status), F.lit(""))
    return (
        F.when((ev == "E") & (st == "0"), F.lit("COMPLETED"))
        .when((ev == "E") & (st != "0"), F.concat(F.lit("FAILED:"), st))
        .when(ev == "A", F.lit("ABORTED"))
        .when(ev == "S", F.lit("STARTED"))
        .when(ev == "Q", F.lit("QUEUED"))
        .otherwise(F.concat(ev, F.lit(":"), st))
    )
