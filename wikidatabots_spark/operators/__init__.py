"""Scale-out extension operators: dedup, similarity search, text analysis,
multimodal plumbing. All designed 100 TB-first (see each module's notes)."""
