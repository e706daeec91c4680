"""Back-compat shim — the hash-stable numeric conventions moved to
:mod:`mare_spark.numeric` so OPERATOR modules can import them without
touching the queries package (importing ``mare_spark.queries.<anything>``
runs the package __init__, which imports every query module, which imports
the operators — a cycle that only detonates on executors unpickling UDFs,
where the operator module is the import root)."""

from mare_spark.numeric import (  # noqa: F401
    MONEY,
    MONEY4,
    MONEY6,
    SQL_MONEY,
    SQL_MONEY4,
    SQL_MONEY6,
    SQL_VALUE4,
    VALUE4,
    davg,
    dec,
    dsum,
    dsum_raw,
    fround,
    sql_davg,
    sql_dsum,
    sql_dsum_raw,
    sql_fround,
)
