"""Per-module query/oracle registry — the one definition of the
``@query`` decorator every operator module previously hand-copied
(review finding r10: 11+ verbatim copies meant any change to
registration semantics had to land in 11+ places).

Each operator module owns its own ``(QUERIES, ORACLES)`` pair —
``__spark_entry__`` and ``llm_data`` aggregate them in registration
order, and THAT ORDER IS GATE ORDER (the driver's correctness window
checks the first 50 aggregated entries), so the registry must stay
per-module and insertion-ordered; only the decorator body is shared.
"""

from __future__ import annotations

from collections.abc import Callable


def make_registry() -> tuple[dict, dict, Callable]:
    """Returns ``(QUERIES, ORACLES, query)`` for one operator module:

        QUERIES, ORACLES, query = make_registry()

        @query("name", oracle="SELECT ...")   # oracle optional:
        def name(spark, sf_dir): ...          # omitted -> rows-only gate

    A duplicate name within one module is a registration bug (the
    second silently shadowed the first under the hand-rolled copies) —
    it raises here."""
    queries: dict = {}
    oracles: dict[str, str] = {}

    def query(name: str, oracle: str | None = None):
        def deco(fn):
            if name in queries:
                raise ValueError(
                    f"duplicate query registration: {name!r}")
            queries[name] = fn
            if oracle is not None:
                oracles[name] = oracle
            return fn
        return deco

    return queries, oracles, query
