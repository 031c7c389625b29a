"""LLM enrichment: speaker naming, summarization, topic extraction."""
