"""SCRAM-SHA-256 client (``pgwire.ScramSha256``) pinned against the
RFC 7677 §3 example exchange byte-for-byte (user=user, pass=pencil,
the published nonces/salt), plus the failure paths a real deployment
hits: tampered server signature, truncated nonce, SASLprep, and the
channel-binding refusal contract. The live-server handshake is proven
in tests/test_postgres_live.py against initdb --auth=scram-sha-256."""

from __future__ import annotations

import pytest

from tile_processor_spark.sources.pgwire import (
    PGConnection,
    PGError,
    ScramSha256,
    _saslprep,
)

# RFC 7677 §3 example values
_C_NONCE = "rOprNGfwEbeRWgbNEkqO"
_S_FIRST = (
    b"r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0,"
    b"s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"
)
_C_FINAL = (
    "c=biws,r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0,"
    "p=dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ="
)
_S_FINAL = b"v=6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4="


def _rfc_client():
    return ScramSha256("pencil", username="user", nonce=_C_NONCE)


def test_rfc7677_example_exchange():
    c = _rfc_client()
    assert c.client_first() == b"n,,n=user,r=" + _C_NONCE.encode()
    assert c.client_final(_S_FIRST).decode() == _C_FINAL
    c.verify_server_final(_S_FINAL)  # must not raise


def test_tampered_server_signature_rejected():
    c = _rfc_client()
    c.client_final(_S_FIRST)
    bad = b"v=" + b"A" * 44
    with pytest.raises(PGError, match="signature mismatch"):
        c.verify_server_final(bad)


def test_server_error_attribute_surfaces():
    c = _rfc_client()
    c.client_final(_S_FIRST)
    with pytest.raises(PGError, match="invalid-proof"):
        c.verify_server_final(b"e=invalid-proof")


def test_server_nonce_must_extend_client_nonce():
    c = _rfc_client()
    with pytest.raises(PGError, match="nonce"):
        c.client_final(b"r=EVILNONCE,s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096")


def test_final_before_continue_rejected():
    with pytest.raises(PGError, match="before client-final"):
        _rfc_client().verify_server_final(_S_FINAL)


def test_zero_iterations_rejected():
    c = _rfc_client()
    with pytest.raises(PGError, match="iteration"):
        c.client_final(b"r=" + _C_NONCE.encode() + b"x,s=AA==,i=0")


def test_username_escaping_rfc5802():
    c = ScramSha256("pw", username="a=b,c", nonce="N")
    assert c.client_first() == b"n,,n=a=3Db=2Cc,r=N"


def test_random_nonce_is_fresh_and_printable():
    a, b = ScramSha256("pw"), ScramSha256("pw")
    na = a.client_first().split(b"r=")[1]
    nb = b.client_first().split(b"r=")[1]
    assert na != nb and len(na) >= 16
    assert b"," not in na  # must not break attribute framing


def test_saslprep():
    assert _saslprep("pencil") == "pencil"
    # non-ASCII space maps to SP; NFKC applies (ROMAN NUMERAL IV → IV)
    assert _saslprep("a\u00a0b") == "a b"
    assert _saslprep("Ⅳ") == "IV"
    # soft hyphen mapped to nothing
    assert _saslprep("pen\u00adcil") == "pencil"
    with pytest.raises(PGError, match="prohibited"):
        _saslprep("a\x00b")
    with pytest.raises(PGError, match="prohibited"):
        _saslprep("a\x07\u00e9")  # control char via non-ASCII path


def test_contradictory_tls_options_refused_before_connecting():
    # refusals happen before any socket is opened — no server needed.
    # channel_binding=require alone is no longer refused (round 12
    # ships TLS + SCRAM-SHA-256-PLUS); the contradiction with
    # sslmode=disable is.
    with pytest.raises(ValueError, match="needs TLS"):
        PGConnection(host="127.0.0.1", port=1, channel_binding="require")
    with pytest.raises(ValueError, match="channel_binding"):
        PGConnection(host="127.0.0.1", port=1, channel_binding="bogus")
    with pytest.raises(ValueError, match="sslmode"):
        PGConnection(host="127.0.0.1", port=1, sslmode="bogus")
    with pytest.raises(ValueError, match="unix socket"):
        PGConnection(host="/nonexistent", sslmode="require")


def test_channel_binding_require_rejects_downgraded_auth():
    """Review r12: an active MITM that terminates TLS won't offer
    SCRAM-PLUS — it will ask for cleartext/md5 or just send
    AuthenticationOk. Under channel_binding=require ALL of those must
    fail before (or without) any secret leaving the client."""
    import socket
    import struct
    import threading

    from tile_processor_spark.sources.pgwire import PGError

    def serve(script):
        srv = socket.socket()
        srv.bind(("127.0.0.1", 0))
        srv.listen(1)

        def run():
            conn, _ = srv.accept()
            conn.recv(65536)  # startup message (no SSLRequest: sslmode off)
            for mtype, body in script:
                conn.sendall(mtype + struct.pack(">I", 4 + len(body)) + body)
            try:
                conn.recv(65536)
            except OSError:
                pass
            conn.close()
            srv.close()

        threading.Thread(target=run, daemon=True).start()
        return srv.getsockname()[1]

    # The attacker controls the post-TLS byte stream, so drive _auth
    # directly against scripted server messages (the constructor's own
    # require+sslmode=disable contradiction check would otherwise
    # refuse before reaching the guards under test).
    from tile_processor_spark.sources import pgwire

    # cleartext request under require → refused BEFORE sending secrets
    port = serve([(b"R", struct.pack(">I", 3))])
    conn = pgwire.PGConnection.__new__(pgwire.PGConnection)
    conn._password = "pw"
    conn._user = "u"
    conn._channel_binding = "require"
    conn._tls = False
    conn._tls_cert_der = None
    conn.sasl_mechanism = None
    conn._sock = socket.create_connection(("127.0.0.1", port), timeout=5)
    conn._buf = b""
    conn._sock.sendall(struct.pack(">II", 8, 196608))  # startup stub
    with pytest.raises(PGError, match="downgrade"):
        conn._auth()
    conn._sock.close()

    # trust (AuthenticationOk straight to ReadyForQuery) under require
    port = serve([(b"R", struct.pack(">I", 0)), (b"Z", b"I")])
    conn._sock = socket.create_connection(("127.0.0.1", port), timeout=5)
    conn._buf = b""
    conn.sasl_mechanism = None
    conn._sock.sendall(struct.pack(">II", 8, 196608))
    with pytest.raises(PGError, match="never bound"):
        conn._auth()
    conn._sock.close()

    # md5 under require
    port = serve([(b"R", struct.pack(">I", 5) + b"salt")])
    conn._sock = socket.create_connection(("127.0.0.1", port), timeout=5)
    conn._buf = b""
    conn._sock.sendall(struct.pack(">II", 8, 196608))
    with pytest.raises(PGError, match="downgrade"):
        conn._auth()
    conn._sock.close()
