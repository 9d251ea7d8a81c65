"""Featurization pipeline mirroring the reference's ``extractFeatures``
(feature/Utils.scala:181-242): clean -> tokenize -> stopword-remove ->
[stem] -> [n-gram] -> TF (HashingTF | CountVectorizer) -> [IDF].

Semantics preserved:
- the "n-gram REPLACES unigram" rule (feature/Utils.scala:206-216; README:
  "pure n-gram feature rather than concatenating")
- custom stopwords appended to the english defaults
  (feature/Utils.scala:190-198; stopwords/extra.txt is state names/demonyms)
- HashingTF 2**20 buckets in production, 2**14 in tests (BASELINE.md)
- optional stemming (reference used an external spark-stemming jar, M3);
  here a Pandas UDF with a tiny Porter-ish suffix stripper, gated off by
  default — the only Python in the pipeline.

Output: input columns + ``features`` (ml VectorUDT). KMeans blocking labels
and LDA/LSA build on this.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import (
    IDF,
    CountVectorizer,
    HashingTF,
    NGram,
    RegexTokenizer,
    StopWordsRemover,
)
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scabillmatch_spark.functions import text as TX
from scabillmatch_spark.ml.stopwords import BILL_STOPWORDS


@dataclass
class FeatureConfig:
    """Mirrors the reference's HOCON knobs (workflow1_makeCartesian.conf)."""

    input_col: str = "content"
    output_col: str = "features"
    num_features: int = 2**14          # HashingTF buckets (2**20 in prod)
    use_idf: bool = True               # TF-IDF vs raw TF
    use_count_vectorizer: bool = False  # CountVectorizer alternative (LDA path)
    vocab_size: int = 2**16            # CountVectorizer vocabSize
    ngram: int | None = None           # n-gram granularity; None = unigrams
    min_token_len: int = 3             # smallWordRemover drops <=2-letter words
    # the reference unconditionally appends its 104-entry bill-domain list
    # (state names/fragments, statute codes, boilerplate) to the english
    # defaults (feature/Utils.scala:190-198); on by default for parity
    use_bill_stopwords: bool = True
    extra_stopwords: list[str] = field(default_factory=list)
    stem: bool = False


def build_pipeline(cfg: FeatureConfig) -> Pipeline:
    """Assemble the ml Pipeline. All stages JVM-side except optional stemming."""
    stages = []
    tokenizer = (
        RegexTokenizer()
        .setInputCol("__clean")
        .setOutputCol("__tokens")
        .setPattern(r"\W")
        .setMinTokenLength(cfg.min_token_len)
    )
    stages.append(tokenizer)

    domain = BILL_STOPWORDS if cfg.use_bill_stopwords else []
    remover = (
        StopWordsRemover()
        .setInputCol("__tokens")
        .setOutputCol("__filtered")
        .setStopWords(
            StopWordsRemover.loadDefaultStopWords("english")
            + domain
            + cfg.extra_stopwords
        )
    )
    stages.append(remover)

    feature_input = "__filtered"
    if cfg.ngram:
        # n-grams REPLACE unigrams (reference rule)
        ng = NGram().setN(cfg.ngram).setInputCol(feature_input).setOutputCol("__ngrams")
        stages.append(ng)
        feature_input = "__ngrams"

    if cfg.use_count_vectorizer:
        tf = (
            CountVectorizer()
            .setInputCol(feature_input)
            .setOutputCol("__tf" if cfg.use_idf else cfg.output_col)
            .setVocabSize(cfg.vocab_size)
        )
    else:
        tf = (
            HashingTF()
            .setInputCol(feature_input)
            .setOutputCol("__tf" if cfg.use_idf else cfg.output_col)
            .setNumFeatures(cfg.num_features)
        )
    stages.append(tf)

    if cfg.use_idf:
        stages.append(IDF().setInputCol("__tf").setOutputCol(cfg.output_col))
    return Pipeline(stages=stages)


def _prepare(df: DataFrame, cfg: FeatureConfig) -> DataFrame:
    clean = TX.clean_text(cfg.input_col)
    if cfg.stem:
        clean = _stem_column(clean)
    return df.withColumn("__clean", clean)


def extract_features(df: DataFrame, cfg: FeatureConfig | None = None) -> tuple[DataFrame, PipelineModel]:
    """Fit + transform; returns (df + features column, fitted model).

    One pass, no driver round-trips (IDF/CountVectorizer fits are Spark jobs).
    """
    cfg = cfg or FeatureConfig()
    prepared = _prepare(df, cfg)
    model = build_pipeline(cfg).fit(prepared)
    out = model.transform(prepared)
    drop = [c for c in ("__clean", "__tokens", "__filtered", "__ngrams", "__tf") if c in out.columns]
    return out.drop(*drop), model


def _stem_column(col):
    """Very small deterministic English suffix-stripper as a fallback for the
    reference's external spark-stemming library (feature/Utils.scala:200-204,
    jar missing from the repo). Column-expression, no UDF: strips common
    suffixes word-by-word."""
    # order matters: longest suffix first
    expr = col
    for suf in ("ational", "iveness", "fulness", "ization", "ations", "ingly",
                "ement", "ments", "ation", "ness", "ing", "edly", "ied",
                "ies", "ed", "es", "s"):
        expr = F.regexp_replace(expr, rf"(\w{{3,}}?){suf}\b", r"$1")
    return expr
