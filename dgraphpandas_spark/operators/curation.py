"""Corpus curation: the composite operator a training-data pipeline
actually runs end-to-end (engine addition — combines the text-analysis and
dedup families into one declarative pass).

Pipeline: quality-score + language-id every document (pure expressions) →
threshold/language filter → MinHash-LSH dedup *among the survivors* →
keep one document per near-dup cluster.  Everything stays one lazy plan:
Catalyst fuses the scoring into the scan projection, the filter prunes
before any shuffle, and the dedup stages inherit the bucketed/equi-join
shapes documented in PLANS.md §3/§3b.

Scale notes: scoring+filtering is embarrassingly parallel (zero
exchanges); dedup runs only on the filtered subset (score-first ordering
is deliberate — cheap filters shrink the expensive stage's input); the
final keep-join is an equi-join on doc id (AQE handles skew).
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import lang_id, quality_score
from .dedup import dedup_clusters


def curate_corpus(
    df: DataFrame,
    id_col: str = 'doc_id',
    text_col: str = 'text',
    min_quality: float = 0.5,
    langs: Sequence[str] = ('en',),
    n: int = 3,
    bands: int = 8,
    threshold: float = 0.8,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Return the curated corpus: documents passing the quality threshold
    and language allowlist, with near-duplicates collapsed to one
    representative (cluster min id) per MinHash-LSH/Jaccard cluster.

    Output: DataFrame[id_col, quality, lang_pred] — one row per kept doc.
    """
    t = F.col(text_col)
    scored = df.select(
        F.col(id_col),
        F.col(text_col),
        F.round(quality_score(t), 6).alias('quality'),
        lang_id(t).alias('lang_pred'),
    )
    passing = scored.filter(
        (F.col('quality') >= min_quality) & F.col('lang_pred').isin(list(langs))
    )
    clusters = dedup_clusters(
        passing.select(F.col(id_col), F.col(text_col)),
        id_col=id_col,
        text_col=text_col,
        n=n,
        bands=bands,
        threshold=threshold,
        max_bucket=max_bucket,
    )
    keep_ids = clusters.filter(F.col('keep')).select(F.col('id').alias(id_col))
    return passing.join(keep_ids, id_col, 'left_semi').select(
        id_col, 'quality', 'lang_pred'
    )
