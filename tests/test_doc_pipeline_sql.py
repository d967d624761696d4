"""Semantic invariants of the corpus-assembly gates (split / pack /
decontaminate), checked Spark-free on the DuckDB oracle SQL: the
driver's correctness gate (tools/check_oracles.py) pins the Spark
plans EQUAL to these oracles, so any invariant proved here holds for
the Spark side too. Independent recomputation in plain Python keeps
the checks from being the oracle testing itself.
"""
from __future__ import annotations

import hashlib
import os

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    import __spark_entry__  # noqa: F401  (repo root on sys.path via conftest)

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    return c


def _oracle(name: str) -> str:
    import __spark_entry__ as entry

    return entry.oracle_sql()[name]


class TestSplitAssign:
    def test_bucket_is_md5_arithmetic(self, con):
        rows = con.execute(_oracle("doc_split_assign")).fetchall()
        assert rows
        for doc_id, split, bucket in rows:
            expect = int(hashlib.md5(str(doc_id).encode())
                         .hexdigest()[:4], 16) % 100
            assert bucket == expect
            assert split == ("train" if bucket < 80
                             else "valid" if bucket < 90 else "test")

    def test_partitions_every_doc_once(self, con):
        n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
        df = con.execute(_oracle("doc_split_assign")).df()
        assert len(df) == n_docs == df["doc_id"].nunique()

    def test_row_order_invariance(self, con):
        """Same assignment when the table is scanned in reverse order —
        the reproducibility property RNG-based splitters lack."""
        con.execute("""CREATE OR REPLACE VIEW documents_rev AS
                       SELECT * FROM documents ORDER BY doc_id DESC""")
        fwd = con.execute(_oracle("doc_split_assign")).df()
        rev = con.execute(_oracle("doc_split_assign")
                          .replace("FROM documents", "FROM documents_rev")
                          ).df()
        key = lambda d: d.sort_values("doc_id").reset_index(drop=True)
        assert key(fwd).equals(key(rev))


class TestPackChunks:
    def test_offsets_reconstruct_running_sum(self, con):
        df = con.execute(_oracle("doc_pack_chunks")).df()
        assert len(df)
        for shard, grp in df.groupby("shard"):
            grp = grp.sort_values("doc_id")
            off = 0
            for _, r in grp.iterrows():
                assert r["chunk_id"] == off // 512
                assert r["chunk_off"] == off % 512
                off += r["n_tokens"]

    def test_chunk_off_bounded(self, con):
        df = con.execute(_oracle("doc_pack_chunks")).df()
        assert (df["chunk_off"] >= 0).all() and (df["chunk_off"] < 512).all()
        assert (df["chunk_id"] >= 0).all()


class TestDecontaminate:
    def _grams(self, text: str, n: int = 3) -> set[str]:
        w = text.split(" ")
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}

    @staticmethod
    def _bucket(doc_id: int) -> int:
        """doc_split_assign's md5 bucket — decontamination scrubs
        against the test split (bucket >= 90) the splitter assigned,
        so the two gates compose into one pipeline (VERDICT r3 #2)."""
        import hashlib

        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4],
                   16) % 100

    def test_flags_match_python_recompute(self, con):
        docs = dict(con.execute(
            "SELECT doc_id, text FROM documents").fetchall())
        eval_grams = set()
        for did, text in docs.items():
            if self._bucket(did) >= 90:
                eval_grams |= self._grams(text)
        flagged = dict(con.execute(_oracle("doc_decontaminate"))
                       .df()[["doc_id", "contaminated"]].values.tolist())
        assert set(flagged) == {d for d in docs if self._bucket(d) < 90}
        for did, flag in flagged.items():
            expect = int(bool(self._grams(docs[did]) & eval_grams))
            assert flag == expect, did

    def test_both_classes_populated(self, con):
        """The fixture must exercise both outcomes or the gate can't
        catch a constant-output regression."""
        df = con.execute(_oracle("doc_decontaminate")).df()
        counts = df["contaminated"].value_counts()
        assert counts.get(0, 0) > 0 and counts.get(1, 0) > 0
