"""Composed operators Spark lacks natively: dedup family, similarity
search, as-of/range joins, sessionization, text analysis, multimodal."""
