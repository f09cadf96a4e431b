"""Pure, Ray-free kernels: RDF terms, rules, crypto, text analysis."""
