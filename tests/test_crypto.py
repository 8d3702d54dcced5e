"""Crypto-shredding (functions/crypto.py): roundtrip, shred-to-NULL,
no-key rejection, non-determinism of ciphertexts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geoestate_etl_spark.functions.crypto import (
    decrypt_with_keys,
    encrypt_columns,
    make_key_table,
    shred_subjects,
)


@pytest.fixture(scope="module")
def pii(spark):
    return spark.createDataFrame(
        [
            (1, "alice@example.com", "Alice"),
            (1, "alice@work.example", "Alice"),
            (2, "bob@example.com", "Bob"),
            (3, "carol@example.com", "Carol"),
        ],
        "user_id long, email string, name string",
    )


def test_roundtrip_and_shred(spark, pii):
    keys = make_key_table(spark, pii, "user_id")
    enc = encrypt_columns(pii, keys, "user_id", ["email", "name"])
    # ciphertext is binary and not the plaintext
    row = enc.filter(F.col("user_id") == 1).first()
    assert isinstance(row.email, (bytes, bytearray))

    back = decrypt_with_keys(enc, keys, "user_id", ["email", "name"])
    got = {(r.user_id, r.email, r.name) for r in back.collect()}
    want = {tuple(r) for r in pii.collect()}
    assert got == want

    # shred user 1: their rows decrypt to NULL, others unaffected
    keys2 = shred_subjects(keys, "user_id", [1])
    after = decrypt_with_keys(enc, keys2, "user_id", ["email", "name"])
    rows = {r.user_id: (r.email, r.name) for r in after.collect() if r.user_id != 1}
    assert rows[2] == ("bob@example.com", "Bob")
    shredded = after.filter(F.col("user_id") == 1).collect()
    assert all(r.email is None and r.name is None for r in shredded)
    assert len(shredded) == 2


def test_missing_key_rejected(spark, pii):
    keys = make_key_table(spark, pii.filter(F.col("user_id") != 3), "user_id")
    with pytest.raises(Exception):
        encrypt_columns(pii, keys, "user_id", ["email"]).collect()


def test_ciphertexts_nondeterministic_by_design(spark, pii):
    """GCM's random IV: same plaintext+key encrypts differently each
    call — equality joins on ciphertext must be impossible (the keyed
    sha2 token in string_suite is the joinable pseudonym)."""
    keys = make_key_table(spark, pii, "user_id")
    a = {r.user_id: bytes(r.name) for r in
         encrypt_columns(pii, keys, "user_id", ["name"]).dropDuplicates(["user_id"]).collect()}
    b = {r.user_id: bytes(r.name) for r in
         encrypt_columns(pii, keys, "user_id", ["name"]).dropDuplicates(["user_id"]).collect()}
    assert any(a[u] != b[u] for u in a)


def test_fresh_key_tables_differ(spark, pii):
    k1 = make_key_table(spark, pii, "user_id")
    k2 = make_key_table(spark, pii, "user_id")
    d1 = {r.user_id: bytes(r.dek) for r in k1.collect()}
    d2 = {r.user_id: bytes(r.dek) for r in k2.collect()}
    assert all(len(v) == 32 for v in d1.values())
    assert d1 != d2  # keys are non-derivable randomness
