"""Native Google OAuth with PKCE (the localhost:4040 callback flow).

Port of `/root/reference/src/auth/mod.rs` (native module, :100-440):
PKCE verifier/challenge generation (S256), the authorization URL, a real
localhost callback HTTP server, the token-exchange request, user-id
hashing, and token persistence with expiry.  The only piece left
pluggable is the outbound HTTPS transport (`http_post` / `http_get`) —
this build runs in a zero-egress environment, so tests exercise the
full flow against an in-process fake Google.
"""

import base64
import dataclasses
import hashlib
import html
import http.server
import json
import os
import secrets
import threading
import time
import urllib.parse
from typing import Callable, Dict, Optional, Tuple

# auth/mod.rs:107-116 (desktop client; secret is public for installed
# apps — PKCE is the security mechanism, per the reference's own note)
CLIENT_ID = ("93370111666-9ofn2c618pt2l557j24tet98aevb03ve"
             ".apps.googleusercontent.com")
CLIENT_SECRET = "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"
REDIRECT_URI = "http://localhost:4040/callback"
AUTH_ENDPOINT = "https://accounts.google.com/o/oauth2/v2/auth"
TOKEN_ENDPOINT = "https://oauth2.googleapis.com/token"
USERINFO_ENDPOINT = "https://www.googleapis.com/oauth2/v2/userinfo"
CALLBACK_PORT = 4040

_VERIFIER_CHARSET = ("ABCDEFGHIJKLMNOPQRSTUVWXYZ"
                     "abcdefghijklmnopqrstuvwxyz0123456789-._~")

SUCCESS_HTML = ("<html><body><h1>Authentication successful!</h1>"
                "<p>You can close this window and return to BONNIE-32."
                "</p></body></html>")
FAILURE_HTML = ("<html><body><h1>Authentication failed</h1>"
                "<p>No authorization code received.</p></body></html>")


def generate_code_verifier(length: int = 64) -> str:
    """auth/mod.rs:132-142 — random 43-128 chars from the PKCE charset."""
    length = max(43, min(length, 128))
    return "".join(secrets.choice(_VERIFIER_CHARSET)
                   for _ in range(length))


def generate_code_challenge(verifier: str) -> str:
    """auth/mod.rs:145-150 — S256: base64url(SHA256(verifier)), no pad."""
    digest = hashlib.sha256(verifier.encode("ascii")).digest()
    return base64.urlsafe_b64encode(digest).decode("ascii").rstrip("=")


def sha256_hex(value: str) -> str:
    """auth/mod.rs:158-163 — user ids are stored hashed."""
    return hashlib.sha256(value.encode("utf-8")).hexdigest()


def build_auth_url(code_challenge: str, client_id: str = CLIENT_ID,
                   redirect_uri: str = REDIRECT_URI) -> str:
    """auth/mod.rs:257-269 — scope openid email, S256, offline."""
    return (f"{AUTH_ENDPOINT}?client_id={client_id}"
            f"&redirect_uri={urllib.parse.quote(redirect_uri, safe='')}"
            "&response_type=code&scope=openid%20email"
            f"&code_challenge={code_challenge}"
            "&code_challenge_method=S256&access_type=offline")


def parse_callback_path(path: str) -> Optional[str]:
    """auth/mod.rs:315-330 — extract `code` from /callback?...; None when
    absent or on other paths."""
    parsed = urllib.parse.urlsplit(path)
    if not parsed.path.startswith("/callback"):
        return None
    params = urllib.parse.parse_qs(parsed.query)
    codes = params.get("code")
    return codes[0] if codes else None


def exchange_code_request(auth_code: str, code_verifier: str,
                          client_id: str = CLIENT_ID,
                          client_secret: str = CLIENT_SECRET,
                          redirect_uri: str = REDIRECT_URI
                          ) -> Tuple[str, str]:
    """auth/mod.rs:367-375 — (url, x-www-form-urlencoded body)."""
    body = (f"client_id={client_id}&client_secret={client_secret}"
            f"&code={urllib.parse.quote(auth_code, safe='')}"
            f"&redirect_uri={urllib.parse.quote(redirect_uri, safe='')}"
            f"&grant_type=authorization_code&code_verifier={code_verifier}")
    return TOKEN_ENDPOINT, body


def parse_token_response(payload: str) -> Tuple[str, Optional[str], int]:
    """auth/mod.rs:391-407 — (access_token, id_token?, expires_in)."""
    data = json.loads(payload)
    access = data.get("access_token")
    if not access:
        raise ValueError("No access_token in response")
    return access, data.get("id_token"), int(data.get("expires_in", 3600))


@dataclasses.dataclass
class TokenStore:
    """auth/mod.rs:119-126."""

    access_token: Optional[str] = None
    id_token: Optional[str] = None
    user_id_hash: Optional[str] = None
    token_expiry: int = 0

    def valid(self, now: Optional[float] = None) -> bool:
        if not self.access_token:
            return False
        now = time.time() if now is None else now
        return now < self.token_expiry

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "TokenStore":
        data = json.loads(text)
        return cls(access_token=data.get("access_token"),
                   id_token=data.get("id_token"),
                   user_id_hash=data.get("user_id_hash"),
                   token_expiry=int(data.get("token_expiry") or 0))


def token_file_path(config_dir: Optional[str] = None) -> str:
    """auth/mod.rs:166-171 — <config>/bonnie-32/auth_token.json."""
    base = config_dir or os.environ.get("XDG_CONFIG_HOME") \
        or os.path.expanduser("~/.config")
    return os.path.join(base, "bonnie-32", "auth_token.json")


def save_tokens(store: TokenStore, config_dir: Optional[str] = None):
    path = token_file_path(config_dir)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(store.to_json())


def load_tokens(config_dir: Optional[str] = None) -> Optional[TokenStore]:
    path = token_file_path(config_dir)
    try:
        with open(path) as f:
            return TokenStore.from_json(f.read())
    except (OSError, ValueError):
        return None


class CallbackServer:
    """Real localhost HTTP server receiving the OAuth redirect
    (auth/mod.rs:272-274, :311-360 wait_for_callback)."""

    def __init__(self, port: int = CALLBACK_PORT):
        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                code = parse_callback_path(self.path)
                if self.path.startswith("/callback"):
                    body = SUCCESS_HTML if code else FAILURE_HTML
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.end_headers()
                    self.wfile.write(body.encode())
                    if code:
                        outer._code = code
                        outer._got.set()
                else:
                    self.send_response(404)
                    self.end_headers()
                    self.wfile.write(b"Not Found")

            def log_message(self, *a):   # quiet
                pass

        self._code: Optional[str] = None
        self._got = threading.Event()
        self._httpd = http.server.HTTPServer(("127.0.0.1", port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()

    def wait_for_code(self, timeout: float = 120.0) -> str:
        """auth/mod.rs:311-318 — 120 s timeout."""
        if not self._got.wait(timeout):
            self.close()
            raise TimeoutError("Authentication timed out")
        self.close()
        assert self._code is not None
        return self._code

    def close(self):
        try:
            self._httpd.shutdown()
            self._httpd.server_close()
        except OSError:
            pass


def sign_in(http_post: Callable[[str, str, Dict[str, str]], str],
            http_get: Callable[[str, Dict[str, str]], str],
            open_browser: Callable[[str], None],
            config_dir: Optional[str] = None,
            port: int = CALLBACK_PORT,
            timeout: float = 120.0,
            now: Optional[Callable[[], float]] = None) -> TokenStore:
    """The full native flow (auth/mod.rs do_sign_in, :251-309):
    PKCE codes -> auth URL -> browser -> localhost callback -> token
    exchange -> user info -> hashed id -> persisted TokenStore.

    `http_post(url, body, headers)` / `http_get(url, headers)` supply the
    outbound transport (zero-egress environment)."""
    verifier = generate_code_verifier()
    challenge = generate_code_challenge(verifier)
    server = CallbackServer(port)   # port=0 lets the OS pick (tests)
    redirect = f"http://localhost:{server.port}/callback"
    url = build_auth_url(challenge, redirect_uri=redirect)
    try:
        open_browser(url)
        code = server.wait_for_code(timeout)
    finally:
        server.close()

    token_url, body = exchange_code_request(code, verifier,
                                            redirect_uri=redirect)
    resp = http_post(token_url, body,
                     {"Content-Type": "application/x-www-form-urlencoded"})
    access, id_token, expires_in = parse_token_response(resp)

    # fetch_user_info (auth/mod.rs:412-430): hash the stable user id
    info = json.loads(http_get(
        USERINFO_ENDPOINT, {"Authorization": f"Bearer {access}"}))
    user_id = str(info.get("id") or info.get("email") or "")
    clock = now or time.time
    store = TokenStore(access_token=access, id_token=id_token,
                       user_id_hash=sha256_hex(user_id),
                       token_expiry=int(clock()) + expires_in)
    save_tokens(store, config_dir)
    return store
