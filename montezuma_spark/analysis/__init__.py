from montezuma_spark.analysis.analyzers import (  # noqa: F401
    ANALYZERS,
    DEFAULT_ANALYZER,
    ENGLISH_STOP_WORDS,
    PORTER_ANALYZER,
    SIMPLE_ANALYZER,
    STANDARD_ANALYZER,
    STOP_ANALYZER,
    WHITESPACE_ANALYZER,
    Analyzer,
    PerFieldAnalyzer,
    get_analyzer,
)
from montezuma_spark.analysis.porter import stem  # noqa: F401
from montezuma_spark.analysis.tokenizers import (  # noqa: F401
    LETTER_TOKENIZER,
    LOWERCASE_TOKENIZER,
    STANDARD_TOKENIZER,
    TOKENIZERS,
    WHITESPACE_TOKENIZER,
    WORD_TOKENIZER,
    Tokenizer,
)
