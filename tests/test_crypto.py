"""Pseudonymizer semantics (reference src/crypto.rs:19-119)."""

import hashlib

import numpy as np
import pytest

from tripsu_ray.functions.crypto import (
    Blake2bKeyed,
    SecretError,
    Sha256Salted,
    content_sha256,
    new_pseudonymizer,
)


def is_hex64(s: str) -> bool:
    return len(s) == 64 and all(c in "0123456789abcdef" for c in s)


def test_sha256_salted_matches_duckdb_formula():
    p = Sha256Salted("salt!")
    assert p.pseudo_bytes(b"abc") == hashlib.sha256(b"salt!abc").hexdigest()


def test_iri_rewrite_keeps_prefix():
    p = Sha256Salted("s")
    out = p.pseudo_iri("http://example.com/tripsu")
    assert out.startswith("http://example.com/")
    assert is_hex64(out[len("http://example.com/") :])
    # hash is of the FULL iri (src/crypto.rs:54)
    assert out.endswith(p.pseudo_bytes(b"http://example.com/tripsu"))


def test_iri_rewrite_hash_separator():
    p = Sha256Salted("s")
    out = p.pseudo_iri("http://example.com/ns#Thing")
    assert out.startswith("http://example.com/ns#")


def test_prefixless_iri_policy():
    # reference panics (src/crypto.rs:51); our documented policy: empty prefix
    p = Sha256Salted("s")
    out = p.pseudo_iri("urn:uuid:1234")
    assert is_hex64(out)


def test_blake2b_secret_too_short():
    with pytest.raises(SecretError):
        Blake2bKeyed(b"short")


def test_blake2b_deterministic_with_secret():
    secret = b"0123456789abcdef0123456789abcdef"
    a, b = Blake2bKeyed(secret), Blake2bKeyed(secret)
    assert a.pseudo_bytes(b"x") == b.pseudo_bytes(b"x")
    assert is_hex64(a.pseudo_bytes(b"x"))


def test_blake2b_random_key_differs():
    assert Blake2bKeyed().pseudo_bytes(b"x") != Blake2bKeyed().pseudo_bytes(b"x")


def test_same_entity_same_pseudonym():
    p = new_pseudonymizer("sha256-salted", "fixed")
    vals = np.array(["a", "b", "a", "c", "b"], dtype=object)
    out = p.pseudo_unique(vals)
    assert out[0] == out[2] and out[1] == out[4] and out[0] != out[1]


def test_factory():
    assert isinstance(new_pseudonymizer("sha256", "s"), Sha256Salted)
    assert isinstance(new_pseudonymizer("blake2b"), Blake2bKeyed)
    with pytest.raises(ValueError):
        new_pseudonymizer("md5")


def test_content_sha256():
    out = content_sha256(np.array(["abc"], dtype=object))
    assert out[0] == hashlib.sha256(b"abc").hexdigest()
