"""Operator library: relational ops + LLM-training-data operators.

The reference (ThatNinjaGuy/universal-data-connector) implements no
joins, aggregations, windows, sorts, or set ops (SURVEY.md §2A "absent"
list — its only transforms are a substring filter and a prefix/suffix
map at ``pipeline/PipelineBuilder.java:133-134``). The north star
mandates the full surface plus dedup / similarity / multimodal / text
operators designed for 100 TB; they live here.
"""
