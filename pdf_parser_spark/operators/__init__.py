"""Web-scale dataset operators: dedup, similarity search, text analysis,
multimodal plumbing. All built on DataFrame built-ins where possible;
Pandas UDFs only where the semantics genuinely need Python."""
