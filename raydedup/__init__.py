"""raydedup — Ray-Data-native near-duplicate detection + sketch engine.

A from-scratch engine with the query/data-processing capabilities of
apache/datasketches-java, re-expressed Ray-Data-first: zero-copy Arrow
map_batches signature stages, groupby LSH shuffles, mergeable-sketch
aggregates, and union-find clustering. See SURVEY.md for the full mapping.
"""

from .config import DEFAULT_CONFIG, SigConfig

__all__ = ["SigConfig", "DEFAULT_CONFIG"]
__version__ = "0.1.0"
