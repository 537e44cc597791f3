"""Wire-accurate in-process fake S3 endpoint — the verification twin of
``sources/s3_client.py``, promoted from the test tier so the external
correctness gate can exercise the S3-native snapshot WRITE path
end-to-end inside the driver's process (a gate row starts this server,
writes through the connector, and reads back through the S3 read
plane; the DuckDB oracle recomputes the result from raw parquet).

The endpoint INDEPENDENTLY re-derives the SigV4 signature from the raw
HTTP request it received (path, query string, the headers the client
declared signed, and the sha256 of the actual body bytes) and rejects
mismatches with 403 — so the client's canonicalization, URI encoding,
and payload hashing are proven against what actually went over the
wire, not against the client's own helpers. Conditional PUT
(If-None-Match: *) is implemented under a real lock, so racing-commit
tests exercise REAL mutual exclusion; listings carry Size and
LastModified (one pass, like S3); multipart upload implements
initiate / part / complete / abort / list with Initiated timestamps.

Server attributes (set by ``start_fake_s3`` / the pytest fixtures):
``objects`` (key → bytes), ``mtimes`` (key → epoch s; tests age
objects by editing it), ``uploads`` (uploadId → {key, initiated,
parts}), ``lock``, ``rejections`` (signature failures — always assert
empty), ``faults`` / ``fault_hits`` (transient-failure injection),
``access_key`` / ``secret_key`` (the credentials requests must sign
with).
"""

from __future__ import annotations

import datetime
import hashlib
import threading
import time
import urllib.parse
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from tile_processor_spark.sources.s3_client import sigv4_signature


def iso_timestamp(ts: float | None) -> str:
    """Epoch seconds → the listing timestamp format S3 emits; a key
    whose mtime was never recorded reads as 'just written' (the SAFE
    side for retention logic)."""
    return (
        datetime.datetime.fromtimestamp(
            ts if ts is not None else time.time(), datetime.timezone.utc
        ).strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3]
        + "Z"
    )


class FakeS3Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"

    # -- independent SigV4 re-derivation from the raw request ----------
    def _verify_signature(self, body: bytes) -> str | None:
        auth = self.headers.get("Authorization", "")
        if not auth.startswith("AWS4-HMAC-SHA256 "):
            return "missing SigV4 authorization"
        parts = dict(
            p.strip().split("=", 1)
            for p in auth[len("AWS4-HMAC-SHA256 "):].split(",")
        )
        cred = parts["Credential"].split("/")
        ak, date, region, service = cred[0], cred[1], cred[2], cred[3]
        if ak != self.server.access_key:  # type: ignore[attr-defined]
            return "unknown access key"
        signed = parts["SignedHeaders"].split(";")
        raw_path, _, raw_query = self.path.partition("?")
        # canonical re-derivation straight from the wire data
        q = urllib.parse.parse_qsl(raw_query, keep_blank_values=True)
        cq = "&".join(
            f"{urllib.parse.quote(k, safe='-._~')}="
            f"{urllib.parse.quote(v, safe='-._~')}"
            for k, v in sorted(q)
        )
        ch = "".join(
            f"{h}:{' '.join((self.headers.get(h) or '').split())}\n"
            for h in signed
        )
        payload_hash = self.headers.get("x-amz-content-sha256", "")
        if hashlib.sha256(body).hexdigest() != payload_hash:
            return "payload hash mismatch"
        creq = "\n".join(
            [self.command, raw_path, cq, ch, ";".join(signed), payload_hash]
        )
        sts = "\n".join(
            [
                "AWS4-HMAC-SHA256",
                self.headers.get("x-amz-date", ""),
                f"{date}/{region}/{service}/aws4_request",
                hashlib.sha256(creq.encode()).hexdigest(),
            ]
        )
        expect = sigv4_signature(
            self.server.secret_key, date, region, service, sts  # type: ignore[attr-defined]
        )
        if expect != parts["Signature"]:
            return "signature mismatch"
        return None

    # -- storage ---------------------------------------------------------
    def _objects(self) -> dict:
        return self.server.objects  # type: ignore[attr-defined]

    def _touch(self, key: str) -> None:
        """Record the key's LastModified (tests age objects by editing
        ``srv.mtimes`` directly)."""
        self.server.mtimes[key] = time.time()  # type: ignore[attr-defined]

    def _lock(self) -> threading.Lock:
        return self.server.lock  # type: ignore[attr-defined]

    def _respond(self, status: int, body: bytes = b"",
                 content_type: str = "application/xml") -> None:
        self.send_response(status)
        self.send_header("Content-Type", content_type)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if self.command != "HEAD":
            self.wfile.write(body)

    def _err(self, status: int, code: str) -> None:
        self._respond(
            status,
            f"<Error><Code>{code}</Code><Message>{code}</Message></Error>"
            .encode(),
        )

    def _key(self) -> str:
        path = urllib.parse.unquote(self.path.partition("?")[0])
        return path.lstrip("/").partition("/")[2]  # strip bucket

    def _query(self) -> dict:
        return dict(
            urllib.parse.parse_qsl(
                self.path.partition("?")[2], keep_blank_values=True
            )
        )

    # -- fault injection (transient-failure tier) ----------------------
    def _maybe_fault(self) -> bool:
        """Serve a queued fault instead of the real handler: a 5xx/409
        XML error, or an abrupt connection close (torn response). Each
        queued fault fires once, matched by verb (+ optional path
        substring) — the retry tests prove one throttle never fails a
        commit and ambiguous outcomes propagate instead of blind-retry."""
        faults = getattr(self.server, "faults", None)
        if not faults:
            return False
        with self._lock():
            hit = None
            for idx, f in enumerate(faults):
                if f.get("verb") and f["verb"] != self.command:
                    continue
                if f.get("path_substr") and f["path_substr"] not in self.path:
                    continue
                hit = faults.pop(idx)
                break
        if hit is None:
            return False
        self.server.fault_hits.append((self.command, self.path))  # type: ignore[attr-defined]
        if hit.get("kind") == "close":
            self.close_connection = True
            self.connection.close()
            return True
        n = int(self.headers.get("Content-Length") or 0)
        self.rfile.read(n)
        self._err(hit.get("status", 503), hit.get("code", "SlowDown"))
        return True

    def do_POST(self) -> None:  # noqa: N802
        if self._maybe_fault():
            return
        n = int(self.headers.get("Content-Length") or 0)
        body = self.rfile.read(n)
        bad = self._verify_signature(body)
        if bad:
            self.server.rejections.append(bad)  # type: ignore[attr-defined]
            return self._err(403, "SignatureDoesNotMatch")
        q = self._query()
        key = self._key()
        uploads = self.server.uploads  # type: ignore[attr-defined]
        if "uploads" in q:  # initiate
            uid = uuid.uuid4().hex
            with self._lock():
                uploads[uid] = {
                    "key": key, "initiated": time.time(), "parts": {}
                }
            return self._respond(
                200,
                (
                    "<InitiateMultipartUploadResult>"
                    f"<UploadId>{uid}</UploadId>"
                    "</InitiateMultipartUploadResult>"
                ).encode(),
            )
        if "uploadId" in q:  # complete
            uid = q["uploadId"]
            import re as re_mod

            wanted = re_mod.findall(rb"<PartNumber>(\d+)</PartNumber>", body)
            with self._lock():
                entry = uploads.get(uid)
                if entry is None:
                    return self._err(404, "NoSuchUpload")
                parts = entry["parts"]
                if sorted(int(p) for p in wanted) != sorted(parts):
                    return self._err(400, "InvalidPartOrder")
                if (
                    self.headers.get("If-None-Match") == "*"
                    and key in self._objects()
                ):
                    return self._err(412, "PreconditionFailed")
                self._objects()[key] = b"".join(
                    parts[n2] for n2 in sorted(parts)
                )
                self._touch(key)
                del uploads[uid]
            return self._respond(
                200,
                b"<CompleteMultipartUploadResult><ETag>x</ETag>"
                b"</CompleteMultipartUploadResult>",
            )
        self._err(400, "BadRequest")

    def do_PUT(self) -> None:  # noqa: N802
        if self._maybe_fault():
            return
        n = int(self.headers.get("Content-Length") or 0)
        body = self.rfile.read(n)
        bad = self._verify_signature(body)
        if bad:
            self.server.rejections.append(bad)  # type: ignore[attr-defined]
            return self._err(403, "SignatureDoesNotMatch")
        key = self._key()
        q = self._query()
        if "partNumber" in q and "uploadId" in q:
            with self._lock():
                entry = self.server.uploads.get(q["uploadId"])  # type: ignore[attr-defined]
                if entry is None:
                    return self._err(404, "NoSuchUpload")
                entry["parts"][int(q["partNumber"])] = body
            self.send_response(200)
            self.send_header("ETag", f'"p{q["partNumber"]}"')
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        src = self.headers.get("x-amz-copy-source")
        with self._lock():
            if src is not None:
                src_key = urllib.parse.unquote(src).lstrip("/").partition("/")[2]
                if src_key not in self._objects():
                    return self._err(404, "NoSuchKey")
                self._objects()[key] = self._objects()[src_key]
                self._touch(key)
                return self._respond(
                    200, b"<CopyObjectResult><ETag>x</ETag></CopyObjectResult>"
                )
            if self.headers.get("If-None-Match") == "*" and key in self._objects():
                return self._err(412, "PreconditionFailed")
            self._objects()[key] = body
            self._touch(key)
        self._respond(200, b"")

    def do_GET(self) -> None:  # noqa: N802
        if self._maybe_fault():
            return
        bad = self._verify_signature(b"")
        if bad:
            return self._err(403, "SignatureDoesNotMatch")
        path, _, query = self.path.partition("?")
        q = dict(urllib.parse.parse_qsl(query, keep_blank_values=True))
        if q.get("list-type") == "2":
            prefix = q.get("prefix", "")
            mtimes = self.server.mtimes  # type: ignore[attr-defined]
            with self._lock():  # snapshot under the writers' lock — a
                # concurrent PUT mutating the dict mid-iteration would
                # 500 the listing (dict changed size during iteration)
                snap = {
                    k: (len(v), mtimes.get(k))
                    for k, v in self._objects().items()
                    if k.startswith(prefix)
                }
            items = "".join(
                f"<Contents><Key>{k}</Key>"
                f"<Size>{size}</Size>"
                f"<LastModified>{iso_timestamp(mt)}</LastModified>"
                "</Contents>"
                for k, (size, mt) in sorted(snap.items())
            )
            return self._respond(
                200,
                (
                    "<ListBucketResult><IsTruncated>false</IsTruncated>"
                    f"{items}</ListBucketResult>"
                ).encode(),
            )
        if "uploads" in q:  # ListMultipartUploads
            prefix = q.get("prefix", "")
            with self._lock():
                rows = sorted(
                    (e["key"], uid, e["initiated"])
                    for uid, e in self.server.uploads.items()  # type: ignore[attr-defined]
                    if e["key"].startswith(prefix)
                )
            items = "".join(
                f"<Upload><Key>{k}</Key><UploadId>{uid}</UploadId>"
                f"<Initiated>{iso_timestamp(ts)}</Initiated></Upload>"
                for k, uid, ts in rows
            )
            return self._respond(
                200,
                (
                    "<ListMultipartUploadsResult>"
                    "<IsTruncated>false</IsTruncated>"
                    f"{items}</ListMultipartUploadsResult>"
                ).encode(),
            )
        key = self._key()
        with self._lock():
            body = self._objects().get(key)
        if body is None:
            return self._err(404, "NoSuchKey")
        self._respond(200, body, content_type="application/octet-stream")

    def do_HEAD(self) -> None:  # noqa: N802
        if self._maybe_fault():
            return
        bad = self._verify_signature(b"")
        if bad:
            return self._err(403, "SignatureDoesNotMatch")
        key = self._key()
        with self._lock():
            body = self._objects().get(key)
        if body is None:
            return self._err(404, "NoSuchKey")
        self._respond(200, body)

    def do_DELETE(self) -> None:  # noqa: N802
        if self._maybe_fault():
            return
        bad = self._verify_signature(b"")
        if bad:
            return self._err(403, "SignatureDoesNotMatch")
        q = self._query()
        with self._lock():
            if "uploadId" in q:  # abort multipart
                self.server.uploads.pop(q["uploadId"], None)  # type: ignore[attr-defined]
            else:
                self._objects().pop(self._key(), None)
        self._respond(204)

    def log_message(self, *a) -> None:  # quiet
        pass


def start_fake_s3(
    access_key: str, secret_key: str
) -> ThreadingHTTPServer:
    """Start the endpoint on an ephemeral 127.0.0.1 port in a daemon
    thread; caller owns shutdown (``srv.shutdown(); srv.server_close()``
    — or let process exit reap the daemon, as the gate row does)."""
    srv = ThreadingHTTPServer(("127.0.0.1", 0), FakeS3Handler)
    srv.objects = {}
    srv.mtimes = {}
    srv.uploads = {}
    srv.lock = threading.Lock()
    srv.rejections = []
    srv.faults = []
    srv.fault_hits = []
    srv.access_key = access_key
    srv.secret_key = secret_key
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv
