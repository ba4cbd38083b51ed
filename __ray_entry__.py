"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself, then:
  - ``entry()``          smoke: flagship KG pipeline on the sf0.001-tier
                         synthetic corpus; returns the canonical edge table
  - ``queries()[name]``  each operator/pipeline from SURVEY.md §2 + the
                         training-data op suite, over ``sf_dir`` tables
  - ``oracle_sql()``     DuckDB twins (identical column names) for every
                         SQL-expressible query; the rest are rows-only and
                         carried by pytest vs the pure-Python oracle

No ray.init()/ray.shutdown() here or anywhere in the library (the caller
owns the session).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline (extract → link → canonicalize → materialize) on
    the deterministic synthetic web-page corpus; returns canonical edges."""
    from graphene_loader_ray.context import configure
    from graphene_loader_ray.pipelines.queries import kg_triples

    configure(quiet=True)
    return kg_triples("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from graphene_loader_ray.context import configure
    from graphene_loader_ray.pipelines.queries import QUERIES

    configure(quiet=True)
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from graphene_loader_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
