"""Authentication + authorization for the query server.

Mirrors the reference's auth surface (src/auth.rs): API keys hashed
with SHA-256 for fast lookup (auth.rs:87-93), random 32-byte keys as 64
hex chars (auth.rs:95-108), password hashing with a memory-hard KDF and
per-user random salt (auth.rs:59-84 uses argon2id; this container ships
no argon2 binding, so we use the stdlib's scrypt — same security class,
format-tagged so a future argon2 backend can coexist), credentials
persisted to a JSON file (auth.rs:111-139 persists TOML;
stdlib-writable JSON carries the same fields), and a global-role
authorization layer (auth.rs:326-420): admin gates system-level
operations (user management, compaction); editors and viewers pass data
operations through, with `.kg create` denied to viewers
(auth.rs:381-389).

Per-KG ACLs (auth.rs:141-324, layer 2) are not implemented — scope cut
recorded in COVERAGE.md; the statement-level hook (`authorize`) is
where they would attach.
"""

from __future__ import annotations

import hashlib
import hmac
import json
import os
import secrets
from dataclasses import dataclass
from typing import Dict, Optional

VALID_ROLES = ("admin", "editor", "viewer")


@dataclass
class AuthIdentity:
    """Authenticated identity attached to a connection (auth.rs:51-55)."""

    username: str
    role: str


def hash_api_key(key: str) -> str:
    """SHA-256 hex digest — API keys are high-entropy random strings, so
    a fast hash is the right lookup primitive (auth.rs:87-93)."""
    return hashlib.sha256(key.encode()).hexdigest()


def generate_api_key() -> str:
    """Random 32 bytes → 64 hex characters (auth.rs:95-108)."""
    return secrets.token_hex(32)


def hash_password(password: str) -> str:
    """Memory-hard KDF with per-user random salt. Format:
    `scrypt$<salt_hex>$<hash_hex>` (reference: argon2id PHC string)."""
    salt = secrets.token_bytes(16)
    dk = hashlib.scrypt(password.encode(), salt=salt, n=2**14, r=8, p=1)
    return f"scrypt${salt.hex()}${dk.hex()}"


def verify_password(password: str, stored: str) -> bool:
    """Constant-time verify against a `hash_password` string; malformed
    hashes verify false, never raise (auth.rs:73-84)."""
    try:
        scheme, salt_hex, hash_hex = stored.split("$")
        if scheme != "scrypt":
            return False
        dk = hashlib.scrypt(
            password.encode(), salt=bytes.fromhex(salt_hex), n=2**14, r=8, p=1
        )
        return hmac.compare_digest(dk.hex(), hash_hex)
    except Exception:
        return False


class AuthStore:
    """Users + API keys, optionally persisted to a JSON file
    (auth.rs PersistedCredentials)."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self.users: Dict[str, dict] = {}  # username -> {password, role}
        self.api_keys: Dict[str, str] = {}  # sha256(key) -> username
        if path and os.path.exists(path):
            with open(path) as fh:
                data = json.load(fh)
            self.users = data.get("users", {})
            self.api_keys = data.get("api_keys", {})

    def save(self) -> None:
        if not self.path:
            return
        tmp = self.path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"users": self.users, "api_keys": self.api_keys}, fh, indent=2)
        os.replace(tmp, self.path)

    # ------------------------------------------------------------ users

    def add_user(self, username: str, password: str, role: str = "viewer") -> None:
        if role not in VALID_ROLES:
            raise ValueError(
                f"Unknown role '{role}'. Valid roles: admin, editor, viewer"
            )
        self.users[username] = {"password": hash_password(password), "role": role}
        self.save()

    def authenticate_password(
        self, username: str, password: str
    ) -> Optional[AuthIdentity]:
        u = self.users.get(username)
        if u and verify_password(password, u["password"]):
            return AuthIdentity(username, u["role"])
        return None

    # ---------------------------------------------------------- api keys

    def issue_api_key(self, username: str) -> str:
        """Generate + register a key for an existing user; only the hash
        is stored (the plaintext key is returned once, never persisted)."""
        if username not in self.users:
            raise ValueError(f"unknown user {username!r}")
        key = generate_api_key()
        self.api_keys[hash_api_key(key)] = username
        self.save()
        return key

    def authenticate_api_key(self, key: str) -> Optional[AuthIdentity]:
        username = self.api_keys.get(hash_api_key(key))
        if username is None:
            return None
        u = self.users.get(username)
        if u is None:
            return None
        return AuthIdentity(username, u["role"])


# ------------------------------------------------------------ authorization


def authorize(identity: AuthIdentity, statement) -> None:
    """Global-role (layer 1) authorization: raises PermissionError when
    the statement is a system-level operation the role may not perform
    (auth.rs:347-420). Data operations always pass — in the reference
    they fall through to per-KG ACLs (layer 2, not implemented)."""
    from inputlayer_spark.ast_nodes import MetaCommand

    if identity.role == "admin":
        return
    if not isinstance(statement, MetaCommand):
        return
    cmd = statement.command
    args = list(statement.args)
    sub = args[0] if args else ""
    if cmd == "compact":
        # compaction is a system-level operation (auth.rs Layer 1)
        raise PermissionError(
            "Permission denied: compaction requires the admin role"
        )
    if cmd == "kg" and sub == "create" and identity.role == "viewer":
        raise PermissionError(
            "Permission denied: viewers cannot create knowledge graphs"
        )
