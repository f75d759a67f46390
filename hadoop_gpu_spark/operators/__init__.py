"""Relational operator surface (SURVEY.md §2).

Each module re-expresses a family of reference operators as idiomatic
DataFrame transformations. Catalyst owns the physical strategy; these
wrappers add the reference semantics (override-join, field selection,
key-field sort specs, aggregate descriptors, ...) and scale hints
(broadcast, range partitioning).
"""
