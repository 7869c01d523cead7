"""Unit tests for the shared lake commit substrate (round 13 —
lakes/commit.py). The lifecycle batteries in test_streaming.py /
test_operators.py exercise these through both lakes end-to-end; these
pin the primitives' contracts directly."""

import json
import os

from geosparql_etl_spark.lakes import commit as lc


def test_ledger_roundtrip_and_replay(tmp_path):
    p = str(tmp_path / "idx")
    os.makedirs(p)
    assert lc.read_ledger_entries(p) == {}
    lc.commit_ledger_entry(p, "base", {"seq": 0, "n": 5})
    lc.commit_ledger_entry(p, "a1", {"seq": 1})
    got = lc.read_ledger_entries(p)
    assert got == {"base": {"seq": 0, "n": 5}, "a1": {"seq": 1}}
    # replay overwrites its own entry idempotently
    lc.commit_ledger_entry(p, "a1", {"seq": 1, "n": 9})
    assert lc.read_ledger_entries(p)["a1"] == {"seq": 1, "n": 9}


def test_assign_seq_replay_stable():
    seqs = {"base": 0, "a1": 1}
    assert lc.assign_seq(seqs, "a1") == 1      # replay keeps seq
    assert lc.assign_seq(seqs, "a2") == 2      # new sequences after all
    assert lc.assign_seq({}, "base") == 0      # fresh index starts at 0


def test_sequence_unledgered_below_ledgered():
    # the round-13 rule: un-ledgered epochs can only PREDATE the
    # ledger, so they sequence below every ledgered seq, base first
    out = lc.sequence_unledgered(["base", "a0", "zz"], {"a9": 5})
    assert out == {"base": 2, "a0": 3, "zz": 4}
    assert max(out.values()) < 5
    # no ledgered seqs: plain 0.. with base first
    assert lc.sequence_unledgered(["z", "base"], {}) == {
        "base": 0, "z": 1
    }
    assert lc.sequence_unledgered([], {"a": 1}) == {}


def test_swap_recover_and_commit(tmp_path):
    live = str(tmp_path / "idx")
    tmp, old = lc.swap_paths(live, "compact")
    assert tmp.endswith(".compact.tmp") and old.endswith(".compact.old")

    def mk(path, tag):
        os.makedirs(path)
        with open(os.path.join(path, "gen.json"), "w") as fh:
            json.dump({"gen": tag}, fh)

    def gen(path):
        with open(os.path.join(path, "gen.json")) as fh:
            return json.load(fh)["gen"]

    # crash between the two renames: only .old exists -> restored
    mk(old, "g1")
    lc.recover_swap(live, old)
    assert gen(live) == "g1" and not os.path.exists(old)
    # stale .old beside a live index -> swept, live untouched
    mk(old, "stale")
    lc.recover_swap(live, old)
    assert gen(live) == "g1" and not os.path.exists(old)
    # the commit itself: live replaced by tmp, no leftovers
    mk(tmp, "g2")
    lc.commit_swap(live, tmp, old)
    assert gen(live) == "g2"
    assert not os.path.exists(tmp) and not os.path.exists(old)


def test_visible_files_and_fingerprint(tmp_path):
    d = str(tmp_path / "t")
    assert not lc.has_visible_files(d)
    assert lc.dir_fingerprint(d) is None
    os.makedirs(d)
    open(os.path.join(d, "_hidden"), "w").write("x")
    open(os.path.join(d, ".tmp"), "w").write("x")
    assert not lc.has_visible_files(d)
    assert lc.dir_fingerprint(d) == ()
    open(os.path.join(d, "part-0.parquet"), "w").write("abc")
    assert lc.has_visible_files(d)
    fp1 = lc.dir_fingerprint(d)
    open(os.path.join(d, "part-1.parquet"), "w").write("defg")
    assert lc.dir_fingerprint(d) != fp1


def test_duplicate_seq_findings():
    assert lc.duplicate_seq_findings({"a": 0, "b": 1}) == []
    got = lc.duplicate_seq_findings({"a": 0, "b": 0, "c": 1})
    assert len(got) == 1
    assert got[0]["check"] == "duplicate_seq"
    assert got[0]["severity"] == "info"
    assert "['a', 'b']" in got[0]["detail"]


def test_stream_id_stable_and_distinct(tmp_path):
    a = lc.stream_id(str(tmp_path / "ckpt_a"))
    b = lc.stream_id(str(tmp_path / "ckpt_b"))
    assert a == lc.stream_id(str(tmp_path / "ckpt_a"))
    assert a != b and len(a) == 8
