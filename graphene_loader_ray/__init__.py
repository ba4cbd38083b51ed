"""graphene_loader_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch re-expression of the capabilities of the reference repo
``ajo2995/graphene-loader`` (a single-threaded Groovy ETL into embedded
Neo4j) as a streaming Ray Data pipeline over Parquet tables of
Common-Crawl-style web pages plus gramene/reactome-style vocabularies:

    pages ──extract──▶ text ──link (actor pool)──▶ triples ──canonicalize──▶
    sorted node/edge Parquet, with per-partition manifests for resume.

Layout:
  functions/   pure scalar/batch helpers (shared with the pure-Python oracle)
  sources/     deterministic fixture synthesis + read helpers
  stages/      the KG pipeline stages (extract, vocab/KB build, link,
               canonicalize, derive, materialize)
  ops/         general-purpose Ray Data operators (joins, windows, dedup,
               similarity search, text stats)
  oracle/      single-process reference-semantics implementation used as the
               correctness gold standard in tests
  pipelines/   end-to-end composition + checkpoint/resume
  state/       broadcast artifacts and counters

None of this package calls ``ray.init()``/``ray.shutdown()``; the caller
(driver, bench.py, pytest fixture) owns the Ray session.
"""

__version__ = "0.1.0"
