"""LLM-data-pipeline extensions: dedup (exact + near-dup), similarity
search, text analysis, multimodal columns. New surface beyond the
reference (driver north star, BASELINE.json), built on the same engine
substrate. Each module exposes EXT_QUERIES: {name: (fn, oracle_sql|None)}.
"""

from .text import EXT_QUERIES as TEXT_QUERIES  # noqa: F401
from .dedup_fuzzy import EXT_QUERIES as DEDUP_QUERIES  # noqa: F401
from .similarity import EXT_QUERIES as SIMILARITY_QUERIES  # noqa: F401
from .multimodal import EXT_QUERIES as MULTIMODAL_QUERIES  # noqa: F401
from .grouped_pandas import EXT_QUERIES as GROUPED_PANDAS_QUERIES  # noqa: F401
from .components import EXT_QUERIES as COMPONENTS_QUERIES  # noqa: F401
from .curation import EXT_QUERIES as CURATION_QUERIES  # noqa: F401
from .contamination import EXT_QUERIES as CONTAMINATION_QUERIES  # noqa: F401
from .quantize import EXT_QUERIES as QUANTIZE_QUERIES  # noqa: F401
from .tfidf import EXT_QUERIES as TFIDF_QUERIES  # noqa: F401
from .fusion import EXT_QUERIES as FUSION_QUERIES  # noqa: F401
from .corpus_prep import EXT_QUERIES as CORPUS_PREP_QUERIES  # noqa: F401
from .incremental_clusters import EXT_QUERIES as INCREMENTAL_QUERIES  # noqa: F401
from .semantic_dedup import EXT_QUERIES as SEMANTIC_DEDUP_QUERIES  # noqa: F401
from .lm_score import EXT_QUERIES as LM_SCORE_QUERIES  # noqa: F401
from .chunking import EXT_QUERIES as CHUNKING_QUERIES  # noqa: F401
from .quality_model import EXT_QUERIES as QUALITY_MODEL_QUERIES  # noqa: F401
from .tokenizer import EXT_QUERIES as TOKENIZER_QUERIES  # noqa: F401

ALL_EXT_QUERIES = {
    **CONTAMINATION_QUERIES,
    **TEXT_QUERIES,
    **TFIDF_QUERIES,
    **CORPUS_PREP_QUERIES,
    **DEDUP_QUERIES,
    **SIMILARITY_QUERIES,
    **QUANTIZE_QUERIES,
    **FUSION_QUERIES,
    **MULTIMODAL_QUERIES,
    **GROUPED_PANDAS_QUERIES,
    **COMPONENTS_QUERIES,
    **CURATION_QUERIES,
    **INCREMENTAL_QUERIES,
    **SEMANTIC_DEDUP_QUERIES,
    **LM_SCORE_QUERIES,
    **CHUNKING_QUERIES,
    **QUALITY_MODEL_QUERIES,
    **TOKENIZER_QUERIES,
}
