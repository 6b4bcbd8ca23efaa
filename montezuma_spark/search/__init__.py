from montezuma_spark.search.ast import (  # noqa: F401
    FILTER,
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanClause,
    BooleanQuery,
    ConstantScoreQuery,
    MatchAllQuery,
    PhraseQuery,
    Query,
    RangeQuery,
    TermQuery,
    FuzzyQuery,
    MultiPhraseQuery,
    RegexpQuery,
    SpanNearQuery,
    WildcardQuery,
    bool_query,
    rewrite,
)
from montezuma_spark.search.searcher import Searcher, bm25_idf  # noqa: F401
from montezuma_spark.search.similarity import (  # noqa: F401
    BM25Similarity,
    ClassicSimilarity,
    Similarity,
    get_similarity,
    register_similarity,
)
