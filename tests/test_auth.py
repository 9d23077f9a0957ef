"""Native OAuth PKCE flow (auth/mod.rs native module): verifier/challenge
vectors, URL construction, a REAL localhost callback server driven by an
in-process browser, and the full sign_in orchestration against a fake
Google transport."""

import json
import threading
import urllib.request

import pytest

from bonnie32_tpu import auth


def test_verifier_charset_and_length():
    v = auth.generate_code_verifier()
    assert 43 <= len(v) <= 128
    assert all(c in auth._VERIFIER_CHARSET for c in v)
    assert auth.generate_code_verifier(10) != auth.generate_code_verifier(10)
    assert len(auth.generate_code_verifier(10)) == 43   # clamped up
    assert len(auth.generate_code_verifier(500)) == 128  # clamped down


def test_code_challenge_s256_vector():
    # RFC 7636 appendix B test vector
    verifier = "dBjftJeZ4CVP-mB92K27uhbUJU1p1r_wW1gFWFOEjXk"
    assert auth.generate_code_challenge(verifier) == \
        "E9Melhoa2OwvFrEMTJguCHaoeK1t8URWbuGJSstw-cM"


def test_auth_url_contents():
    url = auth.build_auth_url("CHALLENGE")
    assert url.startswith(auth.AUTH_ENDPOINT + "?")
    assert "code_challenge=CHALLENGE" in url
    assert "code_challenge_method=S256" in url
    assert "scope=openid%20email" in url
    assert "redirect_uri=http%3A%2F%2Flocalhost%3A4040%2Fcallback" in url


def test_parse_callback_path():
    assert auth.parse_callback_path("/callback?code=abc%2F123&x=1") \
        == "abc/123"
    assert auth.parse_callback_path("/callback?state=z") is None
    assert auth.parse_callback_path("/favicon.ico") is None


def test_exchange_request_shape():
    url, body = auth.exchange_code_request("CODE", "VERIFIER")
    assert url == auth.TOKEN_ENDPOINT
    assert "grant_type=authorization_code" in body
    assert "code=CODE" in body and "code_verifier=VERIFIER" in body


def test_token_store_roundtrip(tmp_path):
    store = auth.TokenStore(access_token="at", id_token="jwt",
                            user_id_hash="h", token_expiry=999)
    auth.save_tokens(store, str(tmp_path))
    loaded = auth.load_tokens(str(tmp_path))
    assert loaded == store
    assert not store.valid(now=1000)
    assert store.valid(now=900)
    assert auth.load_tokens(str(tmp_path / "missing")) is None


def test_full_sign_in_flow(tmp_path):
    """End-to-end: browser-open hits the REAL localhost callback server;
    token exchange + userinfo go through a fake Google."""
    calls = {}

    def open_browser(url):
        # the "user" approves instantly: follow the redirect ourselves
        calls["auth_url"] = url
        def go():
            port = url.split("localhost%3A")[1].split("%2F")[0]
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/callback?code=AUTHCODE42")
        threading.Thread(target=go, daemon=True).start()

    def http_post(url, body, headers):
        assert url == auth.TOKEN_ENDPOINT
        assert "code=AUTHCODE42" in body
        calls["exchange_body"] = body
        return json.dumps({"access_token": "AT", "id_token": "JWT",
                           "expires_in": 1200})

    def http_get(url, headers):
        assert headers["Authorization"] == "Bearer AT"
        return json.dumps({"id": "user-77", "email": "u@example.com"})

    store = auth.sign_in(http_post, http_get, open_browser,
                         config_dir=str(tmp_path), port=0, timeout=10,
                         now=lambda: 1000.0)
    assert store.access_token == "AT"
    assert store.id_token == "JWT"
    assert store.user_id_hash == auth.sha256_hex("user-77")
    assert store.token_expiry == 1000 + 1200
    # PKCE verifier in the exchange matches the challenge in the auth URL
    verifier = calls["exchange_body"].split("code_verifier=")[1]
    challenge = calls["auth_url"].split("code_challenge=")[1].split("&")[0]
    assert auth.generate_code_challenge(verifier) == challenge
    # persisted
    assert auth.load_tokens(str(tmp_path)).access_token == "AT"
