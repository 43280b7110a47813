"""Driver-contract query package (split from the single-file
__ray_entry__.py, r3 verdict #5).

Modules:
  common          — shared plumbing (pruned ``_read``, worker-shipping)
  queries_cdc     — CDC / lake pipelines (the engine surface)
  queries_text    — text / corpus training-data operators
  queries_rel     — transforms, joins, windows, retrieval
  queries_dedup   — dedup / similarity / multimodal
  oracle_helpers  — SQL-construction helpers for the DuckDB oracles
  oracles         — the DuckDB oracle registry (``oracle_sql``)

Importing this package registers every module (plus the engine package)
by value with Ray's cloudpickle so map_batches callables work from
foreign-cwd drivers — see ``common._register_package_by_value``.
"""

from . import (  # noqa: F401
    common,
    oracle_helpers,
    oracles,
    queries_cdc,
    queries_dedup,
    queries_rel,
    queries_text,
)
from .common import _register_package_by_value

_register_package_by_value()
