"""LLM-training-data pipeline operators: deduplication, similarity
search, text analysis, multimodal columns. Beyond the reference's own
surface (SURVEY.md §7 M4); every operator is partition-parallel with no
driver-side loops, designed for 100 TB inputs.
"""
