"""Engine operators: reshaping, joins, dedup, similarity, text, multimodal."""
