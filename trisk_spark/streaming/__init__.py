"""Structured Streaming layer: the reference's DataStream programs
re-expressed as streaming DataFrames (SURVEY.md §1.4 mapping table).

sources  — bounded file-replay of the driver's tables (test harness for
           stream≡batch equivalence) + rate-synthesized Nexmark streams
           (the reference's rate-controlled generators)
queries  — §2B queries as streaming transformations with watermarks
state    — custom keyed-state operators (transformWithStateInPandas):
           order-book matchmaker, running word count, emit-once join
"""
