"""Scale operators for large training-data pipelines (beyond the reference's
own operator set, per the build brief): dedup family, similarity search,
text analysis, multimodal plumbing, and the relational query battery used by
the __ray_entry__ DuckDB conformance gate."""
