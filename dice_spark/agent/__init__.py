"""Agent-facing tool facades over the retrieval operators."""
