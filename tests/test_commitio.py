"""The shared create-if-absent commit primitive (sources/commitio, r13 —
VERDICT r12 items 2-3 + ADVICE r12 medium): os.link locally, HDFS-rename
semantics remotely, conditional-PUT hooks for S3-class stores, and a
LOUD refusal where no atomic primitive exists. The race tests inject the
interleaving the primitive exists to survive: both writers pass their
exists check, exactly one commit lands."""

from __future__ import annotations

import os

import pytest
from pyarrow import fs as pafs

from etl_hiscox_spark.sources import commitio


class _FakeHdfs:
    """Local-backed stand-in with HDFS RENAME SEMANTICS: move() refuses an
    existing destination (org.apache.hadoop.fs rename returns false). The
    class is re-named to HadoopFileSystem below so commitio's type dispatch
    takes its HDFS branch."""

    def __init__(self):
        self._fs = pafs.LocalFileSystem()

    def create_dir(self, p, recursive=True):
        self._fs.create_dir(p, recursive=recursive)

    def get_file_info(self, p):
        return self._fs.get_file_info(p)

    def open_output_stream(self, p):
        return self._fs.open_output_stream(p)

    def open_input_file(self, p):
        return self._fs.open_input_file(p)

    def delete_file(self, p):
        self._fs.delete_file(p)

    def move(self, src, dst):
        if self._fs.get_file_info(dst).type != pafs.FileType.NotFound:
            raise OSError(f"rename destination already exists: {dst}")
        self._fs.move(src, dst)


_FakeHdfs.__name__ = "HadoopFileSystem"


class _FakeS3:
    pass


_FakeS3.__name__ = "S3FileSystem"


def _mock_resolver(fake_fs, tmp_path):
    def resolver(uri):
        assert uri.startswith("mock://")
        return fake_fs, str(tmp_path) + "/" + uri.split("://", 1)[1].split("/", 1)[1]

    return resolver


def test_local_commit_is_create_if_absent(spark, tmp_path):
    uri = "file://" + str(tmp_path / "log" / "v0.json")
    commitio.commit_if_absent(spark, uri, b"first")
    with pytest.raises(FileExistsError):
        commitio.commit_if_absent(spark, uri, b"second")
    assert (tmp_path / "log" / "v0.json").read_bytes() == b"first"
    # no tmp debris from the losing attempt
    assert sorted(os.listdir(tmp_path / "log")) == ["v0.json"]


def test_hdfs_rename_race_exactly_one_lands(spark, tmp_path, monkeypatch):
    """The injected interleaving (VERDICT r12 item 3): writer B passes the
    exists check, writer A commits fully, then B's rename must REFUSE —
    exactly one record lands and the loser gets FileExistsError."""
    from etl_hiscox_spark.sources import listing

    fake = _FakeHdfs()
    monkeypatch.setattr(listing, "_resolve_fs", _mock_resolver(fake, tmp_path))
    uri = "mock://bucket/log/v0.json"

    real_get = fake.get_file_info
    state = {"fired": False}

    def interleaved_get(p):
        info = real_get(p)
        if p.endswith("v0.json") and not state["fired"]:
            state["fired"] = True
            # writer A lands AFTER B's exists check reported NotFound
            commitio.commit_if_absent(spark, uri, b"writer-a")
        return info

    monkeypatch.setattr(fake, "get_file_info", interleaved_get)
    with pytest.raises(FileExistsError):
        commitio.commit_if_absent(spark, uri, b"writer-b")
    final = tmp_path / "log" / "v0.json"
    assert final.read_bytes() == b"writer-a"
    # the loser's staged tmp was cleaned up
    assert sorted(os.listdir(tmp_path / "log")) == ["v0.json"]


def test_s3_class_refused_without_conditional_put(spark, tmp_path, monkeypatch):
    """ADVICE r12 medium: no registered conditional PUT -> refuse loudly,
    never degrade to exists-check + overwriting move."""
    from etl_hiscox_spark.sources import listing

    monkeypatch.setattr(listing, "_resolve_fs", _mock_resolver(_FakeS3(), tmp_path))
    with pytest.raises(NotImplementedError, match="conditional PUT"):
        commitio.commit_if_absent(spark, "mock://bucket/log/v0.json", b"x")


def test_conditional_put_hook_is_used_and_collision_loud(spark, tmp_path, monkeypatch):
    from etl_hiscox_spark.sources import listing

    fake = _FakeS3()
    monkeypatch.setattr(listing, "_resolve_fs", _mock_resolver(fake, tmp_path))
    landed: dict[str, bytes] = {}

    def conditional_put(filesystem, path, data):
        assert filesystem is fake
        if path in landed:
            raise FileExistsError(path)
        landed[path] = data

    commitio.register_put_if_absent("S3FileSystem", conditional_put)
    try:
        uri = "mock://bucket/log/v0.json"
        commitio.commit_if_absent(spark, uri, b"first")
        with pytest.raises(FileExistsError):
            commitio.commit_if_absent(spark, uri, b"second")
        assert list(landed.values()) == [b"first"]
    finally:
        commitio.register_put_if_absent("S3FileSystem", None)
    # unregistered again -> back to the loud refusal
    with pytest.raises(NotImplementedError):
        commitio.commit_if_absent(spark, "mock://bucket/log/v1.json", b"x")


def test_rerun_on_generation_conflict_bounded(spark):
    from etl_hiscox_spark.sources.genlog import rerun_on_generation_conflict

    calls = {"n": 0}

    def always_collides():
        calls["n"] += 1
        raise FileExistsError("pointer v1 already committed")

    with pytest.raises(RuntimeError, match="pointer race 3 times"):
        rerun_on_generation_conflict(always_collides, attempts=3)
    assert calls["n"] == 3

    def succeeds_second_try():
        calls["n"] += 1
        if calls["n"] < 5:
            raise FileExistsError("collision")
        return "done"

    assert rerun_on_generation_conflict(succeeds_second_try, attempts=2) == "done"


def test_hdfs_transient_move_error_surfaces_as_itself(spark, tmp_path, monkeypatch):
    """r13 review: a move OSError with NO landed destination is a
    transient failure (quota/permission/network), not a commit race —
    it must surface as OSError, never FileExistsError (which the OCC
    caller would treat as retryable)."""
    from etl_hiscox_spark.sources import listing

    fake = _FakeHdfs()
    monkeypatch.setattr(listing, "_resolve_fs", _mock_resolver(fake, tmp_path))

    def broken_move(src, dst):
        raise OSError("quota exceeded")

    monkeypatch.setattr(fake, "move", broken_move)
    with pytest.raises(OSError, match="quota exceeded"):
        commitio.commit_if_absent(spark, "mock://bucket/log/v0.json", b"x")
    # staged tmp cleaned up, nothing landed
    assert sorted(os.listdir(tmp_path / "log")) == []


def test_hdfs_rename_landed_but_client_errored_is_success(spark, tmp_path, monkeypatch):
    """r13 review: when the rename actually landed server-side but the
    client got an error, reporting a race would make the OCC caller
    re-commit the same staged batch at the next version (double-counted
    rows). Landed-with-our-content == success."""
    from etl_hiscox_spark.sources import listing

    fake = _FakeHdfs()
    monkeypatch.setattr(listing, "_resolve_fs", _mock_resolver(fake, tmp_path))
    real_move = fake.move

    def flaky_move(src, dst):
        real_move(src, dst)  # the rename lands...
        raise OSError("client timeout")  # ...but the client errors

    monkeypatch.setattr(fake, "move", flaky_move)
    commitio.commit_if_absent(spark, "mock://bucket/log/v0.json", b"mine")
    assert (tmp_path / "log" / "v0.json").read_bytes() == b"mine"


def test_replace_is_atomic_store_classes():
    """r17: the retire-vs-marker ordering branches on whether replace_put
    is one atomic swap. Local fs (POSIX rename replaces) and hooked
    stores are atomic; an unhooked remote class (HDFS-style rename
    refusal -> delete+move absence window) is not."""
    from pyarrow import fs as pafs

    from etl_hiscox_spark.sources import commitio

    assert commitio.replace_is_atomic(pafs.LocalFileSystem()) is True

    class _FakeRemote:
        pass

    assert commitio.replace_is_atomic(_FakeRemote()) is False
    commitio.register_replace_put("_FakeRemote", lambda fs, p, d: None)
    try:
        assert commitio.replace_is_atomic(_FakeRemote()) is True
    finally:
        commitio.register_replace_put("_FakeRemote", None)
    assert commitio.replace_is_atomic(_FakeRemote()) is False
