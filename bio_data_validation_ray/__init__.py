"""bio_data_validation_ray — a Ray-Data-native schema + constraint validation engine.

A from-scratch re-expression of the semantics of
jscaldwell55/bio_data_validation (see /root/reference, SURVEY.md) as a
streaming Ray Data pipeline over Parquet transcript tables
(conv_id, turn_idx, role, text, tool, ts):

- declarative, versioned, sha256-hashed RuleRegistry
  (reference: src/agents/orchestrator.py:130-177, config/validation_rules.yml:5-23)
- rules compiled to vectorized pyarrow.compute predicates applied via
  ``Dataset.map_batches(batch_format="pyarrow")``
  (reference ancestors: src/validators/rule_validator.py, bio_rules.py)
- mergeable sketches (Welford moments, t-digest, HLL) reduced per batch
  (reference ancestors: src/validators/matrix_validator.py:531-659)
- conversation-grouped checks (uniqueness of (conv_id, turn_idx),
  monotonic/contiguous turn_idx, ts ordering, referential integrity) via
  per-batch segment partials + a small keyed shuffle
  (reference ancestors: rule_validator.py:274-286, variant_validator.py:394-429)
- severity->decision policy matrix (reference: src/agents/policy_engine.py:145-182)
- per-partition lineage/checkpoint table for idempotent resume (new; nearest
  reference analog: the SQLite cache, src/utils/cache_manager.py)

Nothing in this package calls ``ray.init()`` / ``ray.shutdown()`` — sessions
are owned by the driver, bench.py, or the pytest fixture.
"""

__version__ = "0.1.0"
