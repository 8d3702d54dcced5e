"""Crypto-shredding: per-subject encryption of PII columns so that
DELETING A KEY forgets the data — the complement of row-deletion RTBF
(``streaming/forget.py``) for the cases row rewrite can't reach
(immutable archives, downstream copies, backups that share the key
table but not the data files).

Pattern (standard privacy engineering):

- every subject (user, customer) gets a random data-encryption key,
  stored in a SMALL separate key table — subject-count-bounded, the
  only mutable state;
- PII columns are encrypted with the subject's key via Spark's
  built-in ``aes_encrypt`` (JVM-side, GCM default — random IV per
  call, so ciphertexts are non-deterministic and equality-joins on
  ciphertext are impossible BY DESIGN; keep a keyed sha2 token
  (``string_suite.pii_token``) alongside when joinability is needed);
- a forget request deletes ONE key row; every ciphertext of that
  subject — wherever it was copied — becomes undecryptable noise.
  ``decrypt_with_keys`` uses ``try_aes_decrypt`` so shredded rows
  surface as NULL, never as a job-killing exception.

Scale: encryption is a map-side Column; the key table joins in as a
broadcast (subjects ≪ rows in the archival shape this targets — for
subject-heavy joins it shuffles on the subject id like any equi-join).

Key generation is driver-side ``secrets`` randomness: keys must NOT
be deterministic/re-derivable (a re-derivable key cannot be
shredded). That makes the KEY TABLE the durability boundary — persist
it like any credential store; this module only handles the data side.
"""

from __future__ import annotations

import secrets

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: AES-256 key length in bytes (Spark aes_encrypt accepts 16/24/32)
KEY_BYTES = 32


def make_key_table(
    spark: SparkSession, subjects: DataFrame, subject_col: str
) -> DataFrame:
    """``(subject, dek)`` — one fresh random data-encryption key per
    distinct subject. Driver-side key generation (subject-count
    bounded; keys must be non-derivable randomness)."""
    ids = [r[0] for r in subjects.select(subject_col).distinct().collect()]
    rows = [(s, secrets.token_bytes(KEY_BYTES)) for s in ids]
    # subject type comes from the source schema — hardcoding long
    # broke string/UUID subject ids (r4 review)
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(
                subject_col, subjects.schema[subject_col].dataType
            ),
            T.StructField("dek", T.BinaryType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def encrypt_columns(
    df: DataFrame,
    keys: DataFrame,
    subject_col: str,
    cols: list[str],
) -> DataFrame:
    """Replace each listed column with its AES-GCM ciphertext under
    the row's subject key (column becomes ``binary``). Rows whose
    subject has no key are REJECTED (inner-join semantics would
    silently drop them; a NULL key would store plaintext) — raise via
    a NULL-key guard after a left join."""
    out = df.join(F.broadcast(keys), subject_col, "left")
    guard = F.when(
        F.col("dek").isNull(),
        F.raise_error(
            F.concat(
                F.lit("encrypt_columns: no key for subject "),
                F.col(subject_col).cast("string"),
            )
        ),
    )
    for c in cols:
        out = out.withColumn(
            c,
            F.coalesce(
                guard.cast("binary"),
                F.aes_encrypt(F.col(c).cast("string"), F.col("dek")),
            ),
        )
    return out.drop("dek")


def decrypt_with_keys(
    df: DataFrame,
    keys: DataFrame,
    subject_col: str,
    cols: list[str],
) -> DataFrame:
    """Inverse view under the CURRENT key table: shredded subjects
    (key row deleted) decrypt to NULL via ``try_aes_decrypt`` — the
    forgotten-data contract, not an error."""
    out = df.join(F.broadcast(keys), subject_col, "left")
    for c in cols:
        out = out.withColumn(
            c,
            F.try_aes_decrypt(F.col(c), F.col("dek")).cast("string"),
        )
    return out.drop("dek")


def shred_subjects(keys: DataFrame, subject_col: str, subjects: list) -> DataFrame:
    """The forget operation: drop the listed subjects' key rows. Data
    files are untouched — their ciphertexts are now noise."""
    return keys.filter(~F.col(subject_col).isin(subjects))
