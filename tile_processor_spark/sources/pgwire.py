"""Minimal pure-Python PostgreSQL v3 wire-protocol client — just
enough for the ``tps_postgres`` Spark connector: startup (trust /
cleartext / md5 / SCRAM-SHA-256 auth), the simple query protocol
(text results), and COPY FROM STDIN for bulk writes.

Why this exists: the reference engine's production path reads/writes
PostgreSQL (tile_processor/db.py), and the JDBC analogue here
(`pipeline/output.py` DSN builder + the opt-in `tests/test_jdbc_live.py`
tier) needs a JDBC driver jar the build container doesn't have — so
the live-database path had never actually run. The protocol itself is
small and fully documented (PostgreSQL Frontend/Backend Protocol,
chapter 55); this client implements the subset the connector needs and
refuses everything else loudly (no extended query protocol, no binary
format).

SCRAM-SHA-256 (RFC 5802 mechanism, RFC 7677 hash binding) matters
because PostgreSQL 14+ defaults ``password_encryption =
scram-sha-256`` — without it the client cannot authenticate against a
stock modern server at all. The implementation is ~80 lines over
``hashlib``/``hmac``/``os.urandom`` (``ScramSha256`` below, unit-tested
against the RFC 7677 example exchange) and includes mandatory
server-signature verification.

TLS (round 12): ``sslmode=require`` performs the v3 SSLRequest dance
and wraps the socket (encryption without certificate verification,
libpq parity); ``verify-full`` verifies the chain + hostname against
``sslrootcert``/the system store. Over TLS the client prefers
SCRAM-SHA-256-PLUS with ``tls-server-end-point`` channel binding
(RFC 5929: the server certificate hashed with its own signature-hash
algorithm, derived here by a minimal DER walk) — so
``channel_binding=require`` now authenticates the CHANNEL, not just
the password, and a MITM that terminates TLS with its own certificate
fails the SCRAM exchange even knowing the stored verifier. The RFC
5802 downgrade rule is honored: on TLS without a -PLUS offer the gs2
flag is 'y', which a -PLUS-stripping attacker cannot survive.

Scope notes:
- one round-trip per ``query()`` (simple 'Q' message), text-format
  results only — the connector parses values by column type OID;
- ``copy_in()`` streams tab-separated COPY text with standard
  backslash escaping — the bulk-ingest fast path (one network stream,
  server-side parse, same as ``psql \\copy``);
- errors surface as ``PGError`` with the server's message fields.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import os
import socket
import ssl as _ssl
import struct
import unicodedata


class PGError(RuntimeError):
    pass


def _saslprep(password: str) -> str:
    """RFC 4013 SASLprep, the subset real passwords hit: map
    non-ASCII spaces to space, drop mapped-to-nothing code points,
    NFKC-normalize, and refuse prohibited (control) characters.
    ASCII passwords pass through unchanged — matching libpq, which
    also falls back to the raw string when the input isn't valid for
    full SASLprep."""
    if password.isascii():
        if any(ord(c) < 0x20 or ord(c) == 0x7F for c in password):
            raise PGError("password contains prohibited control characters")
        return password
    # RFC 3454 table B.1 (commonly mapped to nothing)
    _nothing = (
        {0x00AD, 0x034F, 0x1806, 0x200B, 0x200C, 0x200D, 0x2060, 0xFEFF}
        | set(range(0x180B, 0x180E))
        | set(range(0xFE00, 0xFE10))
    )
    mapped = []
    for ch in password:
        if unicodedata.category(ch) == "Zs":
            mapped.append(" ")  # non-ASCII space → SP
        elif ord(ch) in _nothing:
            continue
        else:
            mapped.append(ch)
    out = unicodedata.normalize("NFKC", "".join(mapped))
    for ch in out:
        if unicodedata.category(ch) in ("Cc", "Cf") or 0xD800 <= ord(ch) <= 0xDFFF:
            raise PGError("password contains prohibited characters (SASLprep)")
    return out


class ScramSha256:
    """Client side of one SCRAM-SHA-256 exchange (RFC 5802 message
    flow, RFC 7677 hash binding). Default gs2 header is ``n,,`` (no
    channel binding); SCRAM-SHA-256-PLUS passes
    ``gs2="p=tls-server-end-point,,"`` plus the certificate hash as
    ``cb_data`` — the c= attribute then binds the exchange to the TLS
    channel (RFC 5802 §6: cbind-input = gs2-header || cb-data). Kept
    free of socket concerns so the RFC 7677 example exchange pins it
    byte-for-byte in unit tests; ``PGConnection`` drives it over
    AuthenticationSASL/Continue/Final messages.

    Server-signature verification is mandatory: ``verify_server_final``
    must be called and raises on mismatch — a MITM that knows only the
    stored verifier cannot forge it."""

    def __init__(
        self,
        password: str,
        username: str = "",
        nonce: str | None = None,
        gs2: str = "n,,",
        cb_data: bytes = b"",
    ):
        self._password = _saslprep(password)
        # PG ignores the SCRAM n= field (the startup-packet user wins),
        # so the wire client sends it empty, like libpq; the RFC test
        # vector sets it
        self._username = username.replace("=", "=3D").replace(",", "=2C")
        self._nonce = nonce or base64.b64encode(os.urandom(18)).decode()
        self._gs2 = gs2
        self._cb_data = cb_data
        self._client_first_bare = f"n={self._username},r={self._nonce}"
        self._auth_message: bytes | None = None
        self._salted: bytes | None = None

    def client_first(self) -> bytes:
        return (self._gs2 + self._client_first_bare).encode()

    def client_final(self, server_first: bytes) -> bytes:
        attrs = dict(
            kv.split("=", 1) for kv in server_first.decode().split(",") if "=" in kv
        )
        server_nonce, salt_b64, iters = attrs["r"], attrs["s"], int(attrs["i"])
        if not server_nonce.startswith(self._nonce):
            raise PGError("SCRAM server nonce does not extend the client nonce")
        if iters < 1:
            raise PGError(f"SCRAM iteration count {iters} is invalid")
        self._salted = hashlib.pbkdf2_hmac(
            "sha256",
            self._password.encode(),
            base64.b64decode(salt_b64),
            iters,
        )
        client_key = hmac.digest(self._salted, b"Client Key", "sha256")
        stored_key = hashlib.sha256(client_key).digest()
        cbind_input = self._gs2.encode() + self._cb_data
        without_proof = (
            f"c={base64.b64encode(cbind_input).decode()},r={server_nonce}"
        )
        self._auth_message = (
            self._client_first_bare.encode()
            + b","
            + server_first
            + b","
            + without_proof.encode()
        )
        signature = hmac.digest(stored_key, self._auth_message, "sha256")
        proof = bytes(a ^ b for a, b in zip(client_key, signature))
        return (without_proof + ",p=" + base64.b64encode(proof).decode()).encode()

    def verify_server_final(self, server_final: bytes) -> None:
        attrs = dict(
            kv.split("=", 1) for kv in server_final.decode().split(",") if "=" in kv
        )
        if "e" in attrs:
            raise PGError(f"SCRAM server error: {attrs['e']}")
        if self._auth_message is None or self._salted is None:
            raise PGError("SCRAM server-final before client-final")
        server_key = hmac.digest(self._salted, b"Server Key", "sha256")
        expect = hmac.digest(server_key, self._auth_message, "sha256")
        if not hmac.compare_digest(
            base64.b64decode(attrs.get("v", "")), expect
        ):
            raise PGError(
                "SCRAM server signature mismatch — refusing to trust the peer"
            )


def _der_read_tlv(buf: bytes, pos: int) -> tuple[int, int, int]:
    """One DER TLV at ``pos``: returns (tag, content_start, content_end)."""
    tag = buf[pos]
    pos += 1
    ln = buf[pos]
    pos += 1
    if ln & 0x80:
        n = ln & 0x7F
        ln = int.from_bytes(buf[pos : pos + n], "big")
        pos += n
    return tag, pos, pos + ln


#: signatureAlgorithm OID (dotted) → the hash "tls-server-end-point"
#: channel binding uses (RFC 5929 §4.1: the certificate's signature
#: hash, with MD5/SHA-1 upgraded to SHA-256)
_SIG_OID_HASH = {
    "1.2.840.113549.1.1.4": "sha256",   # md5WithRSA → upgraded
    "1.2.840.113549.1.1.5": "sha256",   # sha1WithRSA → upgraded
    "1.2.840.113549.1.1.11": "sha256",  # sha256WithRSA
    "1.2.840.113549.1.1.12": "sha384",
    "1.2.840.113549.1.1.13": "sha512",
    "1.2.840.10045.4.1": "sha256",      # ecdsa-with-SHA1 → upgraded
    "1.2.840.10045.4.3.2": "sha256",    # ecdsa-with-SHA256
    "1.2.840.10045.4.3.3": "sha384",
    "1.2.840.10045.4.3.4": "sha512",
}


def _decode_oid(b: bytes) -> str:
    first = b[0]
    parts = [str(first // 40), str(first % 40)]
    v = 0
    for byte in b[1:]:
        v = (v << 7) | (byte & 0x7F)
        if not byte & 0x80:
            parts.append(str(v))
            v = 0
    return ".".join(parts)


def tls_server_end_point_hash(der_cert: bytes) -> bytes:
    """RFC 5929 tls-server-end-point channel-binding data: the server
    certificate hashed with its own signature-hash algorithm (MD5/SHA-1
    upgraded to SHA-256). Raises on signature algorithms outside the
    map — SCRAM-PLUS then falls back to plain SCRAM rather than binding
    to a hash the server would compute differently."""
    # Certificate ::= SEQUENCE { tbsCertificate, signatureAlgorithm
    #                            SEQUENCE { OID ... }, signature }
    _tag, start, _end = _der_read_tlv(der_cert, 0)
    _t, s1, e1 = _der_read_tlv(der_cert, start)      # tbsCertificate
    _t, s2, e2 = _der_read_tlv(der_cert, e1)         # signatureAlgorithm
    tag, s3, e3 = _der_read_tlv(der_cert, s2)        # the OID itself
    if tag != 0x06:
        raise ValueError("malformed certificate: signatureAlgorithm OID")
    oid = _decode_oid(der_cert[s3:e3])
    alg = _SIG_OID_HASH.get(oid)
    if alg is None:
        raise ValueError(f"unsupported certificate signature OID {oid}")
    return hashlib.new(alg, der_cert).digest()


# type OIDs the connector maps (pg_catalog.pg_type)
OID_BOOL = 16
OID_INT8 = 20
OID_INT2 = 21
OID_INT4 = 23
OID_TEXT = 25
OID_FLOAT4 = 700
OID_FLOAT8 = 701
OID_BPCHAR = 1042
OID_VARCHAR = 1043
OID_DATE = 1082
OID_TIMESTAMP = 1114
OID_TIMESTAMPTZ = 1184
OID_NUMERIC = 1700


class PGConnection:
    """One TCP (or unix-socket) connection, simple-protocol only."""

    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 5432,
        user: str = "postgres",
        database: str = "postgres",
        password: str | None = None,
        timeout: float = 30.0,
        channel_binding: str = "disable",
        sslmode: str = "disable",
        sslrootcert: str | None = None,
    ):
        if channel_binding not in ("disable", "prefer", "require"):
            raise ValueError(
                "channel_binding must be disable/prefer/require, got "
                f"{channel_binding!r}"
            )
        if sslmode not in ("disable", "prefer", "require", "verify-full"):
            raise ValueError(
                "sslmode must be disable/prefer/require/verify-full, "
                f"got {sslmode!r}"
            )
        if channel_binding == "require" and sslmode == "disable":
            # SCRAM-SHA-256-PLUS binds the auth exchange to the TLS
            # channel — refuse the contradiction at connect time,
            # before any credential material goes on the wire
            raise ValueError(
                "channel_binding=require needs TLS; pass "
                "sslmode=require (or verify-full) as well"
            )
        self._password = password
        self._user = user
        self._channel_binding = channel_binding
        self._tls = False
        self._tls_cert_der: bytes | None = None
        self.sasl_mechanism: str | None = None
        if host.startswith("/"):
            # TLS is never used on unix sockets (libpq behavior): the
            # kernel already authenticates the peer
            if sslmode in ("require", "verify-full"):
                raise ValueError("sslmode=require on a unix socket")
            self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            self._sock.settimeout(timeout)
            self._sock.connect(f"{host}/.s.PGSQL.{port}")
        else:
            self._sock = socket.create_connection((host, port), timeout=timeout)
            if sslmode != "disable":
                self._negotiate_tls(host, sslmode, sslrootcert)
        self._buf = b""
        params = (
            b"user\x00" + user.encode() + b"\x00"
            b"database\x00" + database.encode() + b"\x00"
            b"client_encoding\x00UTF8\x00\x00"
        )
        self._send_raw(struct.pack(">II", 8 + len(params), 196608) + params)
        self._auth()

    def _negotiate_tls(
        self, host: str, sslmode: str, sslrootcert: str | None
    ) -> None:
        """The v3 SSLRequest dance: magic 80877103, the server answers
        ONE raw byte — 'S' (proceed with the TLS handshake) or 'N'.
        ``require`` encrypts without certificate verification (libpq
        parity — the threat model is passive snooping; channel binding
        or verify-full handle active MITM); ``verify-full`` verifies
        the chain (``sslrootcert`` or the system store) AND the
        hostname."""
        self._sock.sendall(struct.pack(">II", 8, 80877103))
        answer = self._sock.recv(1)
        if answer == b"":
            # the server closed the connection before answering — a
            # connect-level failure, NOT an SSL refusal: proceeding
            # under sslmode=prefer would send the startup packet on a
            # dead socket and surface a confusing later error
            raise PGError("connection closed during SSL negotiation")
        if answer != b"S":
            if sslmode == "prefer":
                return  # plaintext it is
            raise PGError(
                f"server refused SSL (answered {answer!r}) but "
                f"sslmode={sslmode}"
            )
        if sslmode == "verify-full":
            ctx = _ssl.create_default_context(cafile=sslrootcert)
        else:
            ctx = _ssl.SSLContext(_ssl.PROTOCOL_TLS_CLIENT)
            ctx.check_hostname = False
            ctx.verify_mode = _ssl.CERT_NONE
        self._sock = ctx.wrap_socket(self._sock, server_hostname=host)
        self._tls = True
        self._tls_cert_der = self._sock.getpeercert(binary_form=True)

    # ---- framing ----

    def _send_raw(self, data: bytes) -> None:
        self._sock.sendall(data)

    def _send(self, mtype: bytes, body: bytes = b"") -> None:
        self._sock.sendall(mtype + struct.pack(">I", 4 + len(body)) + body)

    def _recv_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise PGError("server closed the connection")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _recv_msg(self) -> tuple[bytes, bytes]:
        head = self._recv_exact(5)
        mtype = head[:1]
        (length,) = struct.unpack(">I", head[1:5])
        return mtype, self._recv_exact(length - 4)

    @staticmethod
    def _error_fields(body: bytes) -> str:
        parts = {}
        for fld in body.split(b"\x00"):
            if fld:
                parts[chr(fld[0])] = fld[1:].decode("utf-8", "replace")
        return f"{parts.get('S', 'ERROR')}: {parts.get('M', '?')} ({parts.get('C', '')})"

    # ---- startup / auth ----

    def _auth(self) -> None:
        while True:
            mtype, body = self._recv_msg()
            if mtype == b"R":
                (code,) = struct.unpack_from(">I", body, 0)
                if code == 0:  # AuthenticationOk
                    continue
                if code == 3:  # cleartext password
                    if self._channel_binding == "require":
                        # an active MITM can downgrade to cleartext to
                        # harvest the password — under 'require' ONLY a
                        # channel-bound SCRAM exchange may see secrets
                        raise PGError(
                            "server requested cleartext auth but "
                            "channel_binding=require (possible downgrade "
                            "attack) — refusing to send the password"
                        )
                    if self._password is None:
                        raise PGError("server wants a password; none given")
                    self._send(b"p", self._password.encode() + b"\x00")
                elif code == 5:  # md5
                    if self._channel_binding == "require":
                        raise PGError(
                            "server requested md5 auth but "
                            "channel_binding=require (possible downgrade "
                            "attack) — refusing to send the hash"
                        )
                    if self._password is None:
                        raise PGError("server wants a password; none given")
                    salt = body[4:8]
                    inner = hashlib.md5(
                        self._password.encode() + self._user.encode()
                    ).hexdigest()
                    outer = hashlib.md5(inner.encode() + salt).hexdigest()
                    self._send(b"p", b"md5" + outer.encode() + b"\x00")
                elif code == 10:  # AuthenticationSASL: mechanism list
                    if self._password is None:
                        raise PGError("server wants a password; none given")
                    mechs = [
                        m.decode() for m in body[4:].split(b"\x00") if m
                    ]
                    mech, gs2, cb = self._select_sasl(mechs)
                    self.sasl_mechanism = mech
                    self._scram = ScramSha256(
                        self._password, gs2=gs2, cb_data=cb
                    )
                    first = self._scram.client_first()
                    self._send(
                        b"p",
                        mech.encode() + b"\x00"
                        + struct.pack(">i", len(first))
                        + first,
                    )
                elif code == 11:  # AuthenticationSASLContinue
                    self._send(b"p", self._scram.client_final(body[4:]))
                elif code == 12:  # AuthenticationSASLFinal
                    # mandatory: raises unless the server proves it
                    # holds the ServerKey for OUR AuthMessage
                    self._scram.verify_server_final(body[4:])
                else:
                    raise NotImplementedError(
                        f"auth method {code} not supported "
                        "(trust/password/md5/scram-sha-256 only)"
                    )
            elif mtype == b"E":
                raise PGError(self._error_fields(body))
            elif mtype == b"Z":  # ReadyForQuery
                if (
                    self._channel_binding == "require"
                    and self.sasl_mechanism != "SCRAM-SHA-256-PLUS"
                ):
                    # trust / any non-SASL path reached readiness
                    # without ever binding to the channel — a MITM
                    # would simply answer AuthenticationOk, so
                    # 'require' must fail the connection here
                    raise PGError(
                        "channel_binding=require but authentication "
                        f"completed via {self.sasl_mechanism or 'trust'} "
                        "— the channel was never bound"
                    )
                return
            # 'S' ParameterStatus / 'K' BackendKeyData / 'N' notices: skip

    def _select_sasl(self, mechs: list[str]) -> tuple[str, str, bytes]:
        """Mechanism + gs2 header + channel-binding data, per the RFC
        5802 downgrade rules: over TLS with the server offering -PLUS
        (and channel_binding not disabled), bind to the certificate
        ('p=tls-server-end-point'); over TLS without -PLUS, advertise
        our capability ('y' — the server MUST reject it if a MITM
        stripped the -PLUS offer); plaintext or disabled → 'n'."""
        cb_hash: bytes | None = None
        if self._tls and self._tls_cert_der is not None:
            try:
                cb_hash = tls_server_end_point_hash(self._tls_cert_der)
            except ValueError:
                cb_hash = None  # unbindable cert → plain SCRAM, gs2 'n'
        use_plus = (
            "SCRAM-SHA-256-PLUS" in mechs
            and self._channel_binding != "disable"
            and cb_hash is not None
        )
        if self._channel_binding == "require" and not use_plus:
            raise PGError(
                "channel_binding=require but SCRAM-SHA-256-PLUS is "
                f"unavailable (TLS={self._tls}, mechanisms={mechs})"
            )
        if use_plus:
            return "SCRAM-SHA-256-PLUS", "p=tls-server-end-point,,", cb_hash
        if "SCRAM-SHA-256" not in mechs:
            raise NotImplementedError(
                f"server offers SASL mechanisms {mechs}; only "
                "SCRAM-SHA-256(-PLUS) is supported"
            )
        if self._tls and cb_hash is not None and self._channel_binding != "disable":
            # we COULD bind but the server did not offer -PLUS: 'y'
            # makes a -PLUS-stripping MITM fail the exchange
            return "SCRAM-SHA-256", "y,,", b""
        return "SCRAM-SHA-256", "n,,", b""

    # ---- simple query ----

    def query(
        self, sql: str
    ) -> tuple[list[tuple[str, int]], list[list[str | None]]]:
        """Run one statement; return (columns as (name, type_oid),
        rows as text values with None for SQL NULL)."""
        self._send(b"Q", sql.encode() + b"\x00")
        cols: list[tuple[str, int]] = []
        rows: list[list[str | None]] = []
        err: str | None = None
        while True:
            mtype, body = self._recv_msg()
            if mtype == b"T":  # RowDescription
                (n,) = struct.unpack_from(">H", body, 0)
                pos = 2
                cols = []
                for _ in range(n):
                    end = body.index(b"\x00", pos)
                    name = body[pos:end].decode()
                    pos = end + 1
                    _tbl, _att, oid, _sz, _mod, _fmt = struct.unpack_from(
                        ">IHIhih", body, pos
                    )
                    pos += 18
                    cols.append((name, oid))
            elif mtype == b"D":  # DataRow
                (n,) = struct.unpack_from(">H", body, 0)
                pos = 2
                row: list[str | None] = []
                for _ in range(n):
                    (ln,) = struct.unpack_from(">i", body, pos)
                    pos += 4
                    if ln == -1:
                        row.append(None)
                    else:
                        row.append(body[pos : pos + ln].decode())
                        pos += ln
                rows.append(row)
            elif mtype == b"E":
                err = self._error_fields(body)
            elif mtype == b"Z":  # ReadyForQuery — statement done
                if err:
                    raise PGError(err)
                return cols, rows
            # 'C' CommandComplete / 'N' notice / 'I' empty query: skip

    def execute(self, sql: str) -> None:
        self.query(sql)

    # ---- COPY FROM STDIN (bulk write) ----

    @staticmethod
    def copy_escape(v: str) -> str:
        return (
            v.replace("\\", "\\\\")
            .replace("\t", "\\t")
            .replace("\n", "\\n")
            .replace("\r", "\\r")
        )

    def copy_in(self, sql: str, lines) -> int:
        """``COPY table (cols) FROM STDIN``: stream tab-separated text
        lines (caller pre-escapes values with ``copy_escape`` and uses
        ``\\N`` for NULL). Returns the row count the server reports."""
        self._send(b"Q", sql.encode() + b"\x00")
        mtype, body = self._recv_msg()
        if mtype == b"E":
            # consume until ready, then raise
            err = self._error_fields(body)
            while self._recv_msg()[0] != b"Z":
                pass
            raise PGError(err)
        if mtype != b"G":  # CopyInResponse
            raise PGError(f"expected CopyInResponse, got {mtype!r}")
        buf = bytearray()
        n = 0
        for line in lines:
            buf += line.encode() + b"\n"
            n += 1
            if len(buf) >= 1 << 20:
                self._send(b"d", bytes(buf))
                buf.clear()
        if buf:
            self._send(b"d", bytes(buf))
        self._send(b"c")  # CopyDone
        rows = n
        err = None
        while True:
            mtype, body = self._recv_msg()
            if mtype == b"C":  # CommandComplete: b"COPY <n>"
                tag = body.rstrip(b"\x00").decode()
                if tag.startswith("COPY "):
                    rows = int(tag.split()[-1])
            elif mtype == b"E":
                err = self._error_fields(body)
            elif mtype == b"Z":
                if err:
                    raise PGError(err)
                return rows

    def close(self) -> None:
        try:
            self._send(b"X")  # Terminate
        except Exception:
            pass
        self._sock.close()

    def __enter__(self) -> "PGConnection":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
