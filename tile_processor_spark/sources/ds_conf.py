"""Session-conf hygiene shared by the Python Data Source connectors.

Both ``tps_snapshot`` and ``tps_postgres`` default to reader classes
that advertise ``pushFilters``, and Spark 4.1 hard-errors
(``DATA_SOURCE_PUSHDOWN_DISABLED``) when such a class is planned while
``spark.sql.python.filterPushdown.enabled`` is false — so
``register()`` must make the conf true on a vanilla session (the
CORRECTNESS_r12 lesson: the engine's own session factory masked the
hole until the driver's bare session hit it).

But an UNCONDITIONAL set would also silently override a session where
an admin deliberately pinned the conf false for unrelated Python
datasources (ADVICE r13). The discriminator is whether the conf was
EXPLICITLY set: ``SET`` (no ``-v``) lists only confs someone set on
this session, never built-in defaults — verified against Spark 4.1's
RuntimeConfig/SQLConf behavior in ``tests/test_vanilla_session.py``.
Unset → enable (vanilla sessions keep working); explicitly set (either
value) → respect it, and a pinned-false environment opts in per-read
with ``.option("pushdown", "false")`` selecting the pushFilters-free
reader class.
"""

from __future__ import annotations

_PUSHDOWN_KEY = "spark.sql.python.filterPushdown.enabled"


def ensure_python_pushdown_conf(spark) -> None:
    """Enable Python-datasource filter pushdown UNLESS the session
    already pinned the conf explicitly (either value)."""
    explicitly_set = any(
        r.key == _PUSHDOWN_KEY for r in spark.sql("SET").collect()
    )
    if not explicitly_set:
        spark.conf.set(_PUSHDOWN_KEY, "true")
