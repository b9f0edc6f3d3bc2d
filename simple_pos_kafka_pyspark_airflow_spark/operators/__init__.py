"""Relational operator library.

Each module re-expresses one family of the reference's dataflow operators
(SURVEY.md §2) as declarative DataFrame transformations: Catalyst picks the
physical strategy (broadcast vs sort-merge joins, partial aggregation,
TakeOrderedAndProject, …); we only hint where the optimizer cannot know
(tiny dimensions → ``F.broadcast``, time-range joins → bucketed equi-join).
"""
