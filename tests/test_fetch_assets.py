"""tools/fetch_assets.py — the BASELINE.md runbook's asset fetcher.

All network activity in these tests is localhost (a stdlib http.server) or
a guaranteed-dead port, so they run identically in the zero-egress build
environment and outside it.
"""

import hashlib
import http.server
import json
import os
import threading

import pytest

from msml_tpu.tools import fetch_assets as fa


def test_dry_run_plans_all_assets(tmp_path, capsys):
    rc = fa.main(["--dest", str(tmp_path), "--dry-run"])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    names = {r["asset"] for r in report["results"]}
    assert names == {"lfw", "cfp_fp", "agedb_30", "checkpoint"}
    assert all(r["status"] == "planned" for r in report["results"])
    # checkpoint without --gdrive-id documents the manual step
    ck = next(r for r in report["results"] if r["asset"] == "checkpoint")
    assert "gdrive-id" in (ck.get("note") or "")
    assert not any(tmp_path.iterdir())  # no network, no files


def test_offline_is_graceful_skip(tmp_path, capsys, monkeypatch):
    # a port nothing listens on -> connection refused fast, not a hang
    monkeypatch.setattr(fa, "TIMEOUT", 2.0)
    plans = {"lfw": {"filename": "lfw.bin", "kind": "verification-bin",
                     "urls": ["http://127.0.0.1:9/lfw.bin"]}}
    monkeypatch.setattr(fa, "manifest", lambda gdrive_id="": plans)
    rc = fa.main(["--dest", str(tmp_path), "--assets", "lfw"])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    (res,) = report["results"]
    assert res["status"] == "skipped (offline)" and res["errors"]


@pytest.fixture()
def local_server(tmp_path):
    root = tmp_path / "srv"
    root.mkdir()
    (root / "lfw.bin").write_bytes(b"fake-bin-payload" * 100)

    class H(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(root), **kw)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", root
    srv.shutdown()


def test_fetch_records_sha256_then_verifies(tmp_path, local_server,
                                            monkeypatch, capsys):
    url, root = local_server
    payload = (root / "lfw.bin").read_bytes()
    want = hashlib.sha256(payload).hexdigest()
    plans = {"lfw": {"filename": "lfw.bin", "kind": "verification-bin",
                     "urls": [f"{url}/lfw.bin"]}}
    monkeypatch.setattr(fa, "manifest", lambda gdrive_id="": plans)
    dest = tmp_path / "dl"

    # 1) first fetch records the sidecar (record-on-first-download)
    assert fa.main(["--dest", str(dest), "--assets", "lfw"]) == 0
    out1 = json.loads(capsys.readouterr().out)["results"][0]
    assert out1["status"] == "fetched" and out1["sha256"] == want
    assert (dest / "lfw.bin").read_bytes() == payload
    assert (dest / "lfw.bin.sha256").read_text().split()[0] == want

    # 2) second run verifies against the sidecar -> present
    assert fa.main(["--dest", str(dest), "--assets", "lfw"]) == 0
    out2 = json.loads(capsys.readouterr().out)["results"][0]
    assert out2["status"] == "present"

    # 3) corruption is detected against the pinned sidecar
    (dest / "lfw.bin").write_bytes(b"tampered")
    assert fa.main(["--dest", str(dest), "--assets", "lfw"]) == 1
    out3 = json.loads(capsys.readouterr().out)["results"][0]
    assert out3["status"] == "corrupt" and out3["expected"] == want

    # 4) an explicit --sha256 pin mismatch refuses the download
    os.remove(dest / "lfw.bin")
    os.remove(dest / "lfw.bin.sha256")
    assert fa.main(["--dest", str(dest), "--assets", "lfw",
                    "--sha256", "lfw=" + "0" * 64]) == 1
    out4 = json.loads(capsys.readouterr().out)["results"][0]
    assert out4["status"] == "checksum-mismatch"
    assert not (dest / "lfw.bin").exists()  # rejected file removed


def test_unknown_asset_errors(tmp_path):
    with pytest.raises(SystemExit):
        fa.main(["--dest", str(tmp_path), "--assets", "nope"])
