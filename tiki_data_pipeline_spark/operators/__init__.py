"""Engine operators: hierarchy/graph, merge/upsert, CDC history,
incremental planning, dedup, similarity, text analysis, multimodal."""
