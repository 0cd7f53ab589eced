"""Arrow-vectorized Python surface (pandas UDFs, multimodal plumbing)."""
