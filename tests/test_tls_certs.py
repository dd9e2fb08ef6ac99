"""TLS certificate-validation semantics against a REAL self-signed HTTPS
server on localhost — the reference's cert matrix
(test/test.cert-validation.ts: fail on self-signed / accept with the flag;
test/test.insecure.ts: allowInsecureCerts end-to-end).

The cert is minted per test run (cryptography lib); no external network.
"""

import datetime
import ipaddress
import ssl
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from linkinator_spark.config import CheckOptions
from linkinator_spark.operators.crawler import check_live
from linkinator_spark.operators.http_fetch import _fetch_one, _HostConnections


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"

    def log_message(self, *a):
        pass

    def _serve(self, method):
        if self.path == "/":
            body = b'<a href="/leaf.html">leaf</a>'
        elif self.path == "/leaf.html":
            body = b"<p>leaf</p>"
        else:
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Type", "text/html")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if method == "GET":
            self.wfile.write(body)

    def do_GET(self):
        self._serve("GET")

    def do_HEAD(self):
        self._serve("HEAD")


def _mint_self_signed(tmpdir):
    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name(
        [x509.NameAttribute(NameOID.COMMON_NAME, "127.0.0.1")])
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name).issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - datetime.timedelta(minutes=5))
        .not_valid_after(now + datetime.timedelta(days=1))
        .add_extension(
            x509.SubjectAlternativeName(
                [x509.IPAddress(ipaddress.IPv4Address("127.0.0.1"))]),
            critical=False,
        )
        .sign(key, hashes.SHA256())
    )
    cert_path = str(tmpdir / "cert.pem")
    key_path = str(tmpdir / "key.pem")
    with open(cert_path, "wb") as f:
        f.write(cert.public_bytes(serialization.Encoding.PEM))
    with open(key_path, "wb") as f:
        f.write(key.private_bytes(
            serialization.Encoding.PEM,
            serialization.PrivateFormat.TraditionalOpenSSL,
            serialization.NoEncryption()))
    return cert_path, key_path


@pytest.fixture(scope="module")
def tls_server(tmp_path_factory):
    tmpdir = tmp_path_factory.mktemp("tls")
    cert_path, key_path = _mint_self_signed(tmpdir)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(cert_path, key_path)
    srv.socket = ctx.wrap_socket(srv.socket, server_side=True)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"https://127.0.0.1:{srv.server_address[1]}", cert_path
    srv.shutdown()


def test_self_signed_rejected_by_default(spark, tls_server):
    """test/test.cert-validation.ts:23-38 — default verification must
    refuse a self-signed cert: the link reads BROKEN status 0."""
    base, _cert = tls_server
    cfg = CheckOptions(paths=[base + "/"], recurse=True, concurrency=2,
                       timeout=10_000)
    res = check_live(spark, cfg)
    rows = {r["url"]: r for r in res.results.collect()}
    assert res.passed is False
    seed = rows[base + "/"]
    assert seed["state"] == "BROKEN" and seed["status"] == 0


def test_self_signed_allowed_with_insecure(spark, tls_server):
    """test/test.cert-validation.ts:72-87 + test.insecure.ts:18 —
    allowInsecureCerts crawls the self-signed site end-to-end."""
    base, _cert = tls_server
    cfg = CheckOptions(paths=[base + "/"], recurse=True, concurrency=2,
                       timeout=10_000, insecure=True)
    res = check_live(spark, cfg)
    rows = {r["url"]: r for r in res.results.collect()}
    assert res.passed is True
    assert rows[base + "/"]["status"] == 200
    assert rows[base + "/leaf.html"]["status"] == 200  # recursion happened


def test_trusted_cert_verifies_without_insecure(tls_server, monkeypatch):
    """test/test.cert-validation.ts:39-60 — a cert the client TRUSTS
    verifies with insecure OFF (unit level: trust our own cert via
    SSL_CERT_FILE, the env stdlib's create_default_context honors)."""
    base, cert_path = tls_server
    monkeypatch.setenv("SSL_CERT_FILE", cert_path)
    conns = _HostConnections(timeout=10.0, insecure=False)
    out = _fetch_one(base + "/leaf.html", "GET", conns, "test-ua", {})
    status = out[0]
    assert status == 200

    # and without the trust anchor the same secure context refuses
    monkeypatch.delenv("SSL_CERT_FILE")
    conns2 = _HostConnections(timeout=10.0, insecure=False)
    out2 = _fetch_one(base + "/leaf.html", "GET", conns2, "test-ua", {})
    assert out2[0] == 0
