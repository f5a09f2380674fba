"""Fetch the real parity assets (reference checkpoint + eval .bin files).

Automates BASELINE.md's "real-asset parity runbook" the day egress exists:
one command downloads the released ``arc18_msml`` checkpoint
(`/root/reference/README.md:60-61` Google-Drive link) and the insightface
verification bins the reference reads from ``{cfg.rec}/{name}.bin``
(`eval/qeval_mxnet.py:515-519`), pins every file with a sha256 sidecar, and
prints a JSON status per asset. In a zero-egress environment every network
fetch degrades to a graceful ``skipped (offline)`` verdict — the tool (and
its dry-run test) stay runnable anywhere.

Usage:
    python -m msml_tpu.tools.fetch_assets --dest /data/msml_assets
    python -m msml_tpu.tools.fetch_assets --dest /data --assets lfw,checkpoint
    python -m msml_tpu.tools.fetch_assets --dry-run        # plan only

After a successful fetch, the parity runbook is:
    python -m msml_tpu.tools.parity_lfw --platform cpu \
        --weight <dest>/arc18_msml/backbone.pth --bin <dest>/lfw.bin ...
(see BASELINE.md for the full command set).

sha256 policy: the reference publishes no checksums, so the first
successful download RECORDS ``<file>.sha256`` next to the asset; later runs
VERIFY against it (or against ``--sha256 name=hex`` pins) and fail loudly
on mismatch — the "record on first download" contract from BASELINE.md.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import re
import sys
import urllib.error
import urllib.parse
import urllib.request

# Reference README's Google-Drive FOLDER for the released checkpoint
# (folder ids cannot be fetched as single files; --gdrive-id overrides with
# the backbone.pth file id once known).
GDRIVE_FOLDER_ID = "18xEKq4iORG1ffNZXVaKofyuuZB-oW2e1"

# insightface dataset-zoo mirrors that bundle the verification bins; the
# reference consumes the extracted {rec}/{name}.bin (qeval_mxnet.py:517-519)
_BIN_URLS = {
    "lfw": ["https://github.com/deepinsight/insightface/releases/download/"
            "v0.7/lfw.bin"],
    "cfp_fp": ["https://github.com/deepinsight/insightface/releases/"
               "download/v0.7/cfp_fp.bin"],
    "agedb_30": ["https://github.com/deepinsight/insightface/releases/"
                 "download/v0.7/agedb_30.bin"],
}

TIMEOUT = float(os.environ.get("MSML_FETCH_TIMEOUT", "30"))


def manifest(gdrive_id: str = "") -> dict:
    """Asset name -> plan dict (filename, candidate urls, kind)."""
    m = {}
    for name, urls in _BIN_URLS.items():
        m[name] = {"filename": f"{name}.bin", "urls": list(urls),
                   "kind": "verification-bin"}
    fid = gdrive_id or ""
    m["checkpoint"] = {
        "filename": os.path.join("arc18_msml", "backbone.pth"),
        # uc?export=download works for FILE ids; the README links a folder,
        # so without --gdrive-id this url is a documented placeholder that
        # fails gracefully with a pointer to the manual step.
        "urls": ([f"https://drive.google.com/uc?export=download&id={fid}"]
                 if fid else []),
        "kind": "reference-checkpoint",
        "note": ("README.md:60-61 links Google-Drive FOLDER "
                 f"{GDRIVE_FOLDER_ID}; pass --gdrive-id <file-id of "
                 "backbone.pth> (shareable-link id) to fetch directly, or "
                 "download manually into <dest>/arc18_msml/"),
    }
    return m


def sha256_file(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def _gdrive_confirm(body: bytes, url: str):
    """Large Google-Drive files answer with an HTML confirm page; extract
    the confirm token and return the follow-up url (None if not one)."""
    if not body[:256].lstrip().startswith(b"<"):
        return None
    mt = re.search(rb'confirm=([0-9A-Za-z_-]+)', body)
    if mt:
        tok = mt.group(1).decode()
        sep = "&" if "?" in url else "?"
        return f"{url}{sep}confirm={tok}"
    return None


def fetch_url(url: str, dest_path: str, hops: int = 0) -> None:
    """Stream url -> dest_path (temp file + atomic rename); follows at most
    two Google-Drive confirm hops, then fails loudly (a server that keeps
    answering with confirm pages must not recurse to the stack limit)."""
    req = urllib.request.Request(url, headers={"User-Agent": "msml-fetch"})
    with urllib.request.urlopen(req, timeout=TIMEOUT) as r:
        head = r.read(4096)
        follow = _gdrive_confirm(head, url) if "drive.google" in url else None
        if follow:
            if hops >= 2:
                raise RuntimeError(
                    f"Google Drive kept answering with confirm pages after "
                    f"{hops} hops for {url!r} — download it manually")
            return fetch_url(follow, dest_path, hops=hops + 1)
        tmp = dest_path + ".part"
        with open(tmp, "wb") as f:
            f.write(head)
            while True:
                b = r.read(1 << 20)
                if not b:
                    break
                f.write(b)
    os.replace(tmp, dest_path)


def fetch_asset(name: str, plan: dict, dest: str, pins: dict,
                dry_run: bool = False) -> dict:
    """Fetch one asset; returns a status dict (never raises on network
    errors — offline is a first-class outcome)."""
    path = os.path.join(dest, plan["filename"])
    sidecar = path + ".sha256"
    status = {"asset": name, "path": path, "kind": plan["kind"]}
    pinned = pins.get(name) or (
        open(sidecar).read().split()[0] if os.path.exists(sidecar) else None)

    if os.path.exists(path):
        digest = sha256_file(path)
        if pinned and digest != pinned:
            status.update(status="corrupt", sha256=digest, expected=pinned)
            return status
        if not os.path.exists(sidecar):
            with open(sidecar, "w") as f:  # record-on-first-download
                f.write(f"{digest}  {os.path.basename(path)}\n")
        status.update(status="present", sha256=digest)
        return status

    if dry_run:
        status.update(status="planned", urls=plan["urls"],
                      note=plan.get("note"))
        return status
    if not plan["urls"]:
        status.update(status="manual", note=plan.get("note"))
        return status

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    errors = []
    for url in plan["urls"]:
        try:
            fetch_url(url, path)
        except (urllib.error.URLError, urllib.error.HTTPError, OSError,
                TimeoutError) as e:
            errors.append(f"{url}: {e}")
            continue
        digest = sha256_file(path)
        if pinned and digest != pinned:
            os.remove(path)
            status.update(status="checksum-mismatch", expected=pinned,
                          sha256=digest, url=url)
            return status
        with open(sidecar, "w") as f:
            f.write(f"{digest}  {os.path.basename(path)}\n")
        status.update(status="fetched", sha256=digest, url=url)
        return status
    status.update(status="skipped (offline)", errors=errors,
                  note=plan.get("note"))
    return status


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--dest", default="assets",
                   help="download directory (bins at top level, checkpoint "
                        "under arc18_msml/ — the weight-folder layout "
                        "cli.test expects)")
    p.add_argument("--assets", default="",
                   help="comma list (default: all): "
                        "lfw,cfp_fp,agedb_30,checkpoint")
    p.add_argument("--gdrive-id", default="",
                   help="Google-Drive FILE id of backbone.pth")
    p.add_argument("--sha256", action="append", default=[],
                   help="pin: name=hex (repeatable); else sidecar files "
                        "record-on-first-download")
    p.add_argument("--dry-run", action="store_true",
                   help="print the fetch plan, no network")
    p.add_argument("--out-json", default="", help="also write status here")
    args = p.parse_args(argv)

    pins = {}
    for spec in args.sha256:
        k, _, v = spec.partition("=")
        pins[k] = v.lower()
    plans = manifest(args.gdrive_id)
    names = ([s.strip() for s in args.assets.split(",") if s.strip()]
             or list(plans))
    unknown = [n for n in names if n not in plans]
    if unknown:
        p.error(f"unknown assets {unknown}; choose from {sorted(plans)}")

    results = [fetch_asset(n, plans[n], args.dest, pins,
                           dry_run=args.dry_run) for n in names]
    report = {"dest": os.path.abspath(args.dest), "results": results,
              "ok": all(r["status"] in ("fetched", "present", "planned",
                                        "skipped (offline)", "manual")
                        for r in results)}
    print(json.dumps(report, indent=2))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(report, f, indent=2)
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
