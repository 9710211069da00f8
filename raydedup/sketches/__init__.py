"""Mergeable sketch implementations (HLL, KLL, frequencies, sampling) and
their Ray Data AggregateFn wrappers — the cardinality/quantile/heavy-hitter
surface of the reference re-expressed as partial+final aggregates."""
