"""raydedup — Ray-Data-native near-duplicate detection & clustering.

Brand-new engine with the query/data-processing capabilities of
JorenSix/Panako (see SURVEY.md), transplanted from audio fingerprinting
to Common-Crawl-style web text. Dataset pipelines of map_batches over
zero-copy Arrow; actor pools for stateful stages; groupby shuffles for
the wide steps.
"""

from raydedup.config import DedupConfig, DEFAULT_CONFIG

__all__ = ["DedupConfig", "DEFAULT_CONFIG"]
