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

Per-KG ACLs (auth.rs:141-324, layer 2): each KG maps usernames to a
KgRole (owner/editor/viewer) — `kg_role_for` resolves the effective
role (admins are implicit owners of every KG,
handler.rs:get_kg_role_for_user), `authorize_kg` gates statements by
that role (owner: everything; editor: everything except `.kg drop` and
ACL management; viewer: queries, session rules, and read-only metas),
and `target_kg` replicates the handler's target-KG resolution
(handler.rs:4330-4369: named-KG metas target their argument;
create/list/show/status/help are global; everything else targets the
current KG). A non-admin with NO ACL entry for the target KG is denied
("Access denied").
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
        # sha256(key) -> {"username": owner, "label": label} (reference
        # api_keys tuples are (label, key_hash, username),
        # handler.rs:1549-1575). Stores written before labels existed
        # hold bare username strings and are upgraded on load.
        self.api_keys: Dict[str, dict] = {}
        self.kg_acls: Dict[str, Dict[str, str]] = {}  # kg -> {user: kg_role}
        if path and os.path.exists(path):
            with open(path) as fh:
                data = json.load(fh)
            self.users = data.get("users", {})
            # pre-label stores held bare username strings; synthesize a
            # stable label from the key hash so legacy keys remain
            # visible in `.apikey list` and revocable by label
            self.api_keys = {
                h: (
                    v
                    if isinstance(v, dict)
                    else {"username": v, "label": f"legacy-{h[:8]}"}
                )
                for h, v in data.get("api_keys", {}).items()
            }
            self.kg_acls = data.get("kg_acls", {})

    def save(self) -> None:
        if not self.path:
            return
        tmp = self.path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "users": self.users,
                    "api_keys": self.api_keys,
                    "kg_acls": self.kg_acls,
                },
                fh,
                indent=2,
            )
        os.replace(tmp, self.path)

    # ------------------------------------------------------ per-KG ACLs

    def grant_kg(self, kg: str, username: str, kg_role: str) -> None:
        """`.kg acl grant <kg> <user> <role>` — upserts the user's role
        on the KG (handler.rs:handle_kg_acl_grant)."""
        if kg_role not in KG_ROLES:
            raise ValueError(
                f"Invalid KG role '{kg_role}'. Valid: owner, editor, viewer"
            )
        self.kg_acls.setdefault(kg, {})[username] = kg_role
        self.save()

    def revoke_kg(self, kg: str, username: str) -> None:
        self.kg_acls.get(kg, {}).pop(username, None)
        self.save()

    def kg_acl_list(self, kg: str):
        """Sorted (user, role) entries for a KG."""
        return sorted(self.kg_acls.get(kg, {}).items())

    def kg_role_for(self, kg: str, identity: "AuthIdentity") -> Optional[str]:
        """Effective per-KG role: admins are implicit owners of every KG
        (handler.rs:get_kg_role_for_user); otherwise the explicit ACL
        entry, or None = no access."""
        if identity.role == "admin":
            return "owner"
        return self.kg_acls.get(kg, {}).get(identity.username)

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

    def drop_user(self, username: str) -> None:
        """`.user drop` — the reference refuses to drop 'admin' and
        cascades: the user's API keys and KG ACL entries are revoked too
        (handler.rs:1373-1441)."""
        if username == "admin":
            raise ValueError("Cannot drop the 'admin' user")
        if username not in self.users:
            raise ValueError(f"User '{username}' not found")
        del self.users[username]
        for h in [h for h, e in self.api_keys.items() if e["username"] == username]:
            del self.api_keys[h]
        for kg in list(self.kg_acls):
            self.kg_acls[kg].pop(username, None)
        self.save()

    def set_password(self, username: str, password: str) -> None:
        if username not in self.users:
            raise ValueError(f"User '{username}' not found")
        self.users[username]["password"] = hash_password(password)
        self.save()

    def set_role(self, username: str, role: str) -> None:
        """`.user role` — role validated, and the 'admin' user cannot be
        demoted (handler.rs:1494-1505)."""
        if role not in VALID_ROLES:
            raise ValueError(
                f"Unknown role '{role}'. Valid roles: admin, editor, viewer"
            )
        if username == "admin" and role != "admin":
            raise ValueError("Cannot change the 'admin' user's role")
        if username not in self.users:
            raise ValueError(f"User '{username}' not found")
        self.users[username]["role"] = role
        self.save()

    def list_users(self):
        """Sorted (username, role) — never the password hash
        (handler.rs:1275-1300)."""
        return sorted((u, e["role"]) for u, e in self.users.items())

    # ---------------------------------------------------------- api keys

    def issue_api_key(self, username: str, label: str = "") -> str:
        """Generate + register a key for an existing user; only the hash
        is stored (the plaintext key is returned once, never persisted)."""
        if username not in self.users:
            raise ValueError(f"unknown user {username!r}")
        key = generate_api_key()
        self.api_keys[hash_api_key(key)] = {"username": username, "label": label}
        self.save()
        return key

    def create_labeled_key(self, label: str, owner: str) -> str:
        """`.apikey create <label>` — labels are unique; the plaintext
        key is returned once and never persisted (handler.rs:1549-1612)."""
        if any(e["label"] == label for e in self.api_keys.values()):
            raise ValueError(f"API key with label '{label}' already exists")
        key = generate_api_key()
        self.api_keys[hash_api_key(key)] = {"username": owner, "label": label}
        self.save()
        return key

    def revoke_key_by_label(self, label: str) -> None:
        h = next(
            (h for h, e in self.api_keys.items() if e["label"] == label), None
        )
        if h is None:
            raise ValueError(f"API key '{label}' not found")
        del self.api_keys[h]
        self.save()

    def list_api_keys(self):
        """Sorted (label, owner) — never the hash (handler.rs:1614-1662)."""
        return sorted((e["label"], e["username"]) for e in self.api_keys.values())

    def authenticate_api_key(self, key: str) -> Optional[AuthIdentity]:
        entry = self.api_keys.get(hash_api_key(key))
        if entry is None:
            return None
        u = self.users.get(entry["username"])
        if u is None:
            return None
        return AuthIdentity(entry["username"], u["role"])


# ------------------------------------------------------------ authorization


def authorize(identity: AuthIdentity, statement) -> None:
    """Global-role (layer 1) authorization: raises PermissionError when
    the statement is a system-level operation the role may not perform
    (auth.rs:347-420). Data operations always pass here and are gated
    by per-KG ACLs instead (layer 2: `target_kg` + `kg_role_for` +
    `authorize_kg`, enforced by the server)."""
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
    if cmd in ("user", "apikey"):
        # user + API-key management is admin-only (reference
        # handler.rs:3601-3612 routes these through admin privileges)
        raise PermissionError(
            "Permission denied: user/API key commands require admin privileges"
        )
    if cmd == "kg" and sub == "create" and identity.role == "viewer":
        raise PermissionError(
            "Permission denied: viewers cannot create knowledge graphs"
        )


# ------------------------------------------------------- per-KG ACLs (layer 2)

KG_ROLES = ("owner", "editor", "viewer")

# read-only meta (command, first-arg) shapes a KG viewer may run
# (auth.rs:authorize_kg_viewer); "" = bare command
_VIEWER_META = {
    ("kg", "show"), ("kg", "list"), ("kg", "use"), ("kg", "acl"),
    ("rel", "list"), ("rel", "describe"),
    ("rule", "list"), ("rule", "def"),
    ("index", "list"), ("index", "stats"),
    ("session", "list"), ("session", "clear"), ("session", "drop"),
    ("debug", ""), ("why", ""), ("why_full", ""), ("why_not", ""),
    ("status", ""), ("help", ""),
}


def target_kg(statement, current_kg: str):
    """Which KG a statement operates on (handler.rs:4330-4369):
    named-KG metas target their argument, KG-create/list/show and
    system introspection are global (None = no per-KG check), and every
    other statement targets the session's current KG."""
    from inputlayer_spark.ast_nodes import MetaCommand

    if isinstance(statement, MetaCommand):
        args = list(statement.args)
        sub = args[0] if args else ""
        if statement.command == "kg":
            if sub in ("use", "drop") and len(args) > 1:
                return args[1]
            if sub == "acl":
                # .kg acl grant <kg> <user> <role> / revoke <kg> <user>
                # / list <kg>
                return args[2] if len(args) > 2 else current_kg
            if sub in ("create", "list", "show", ""):
                return None
        if statement.command in ("status", "help", "compact", "user", "apikey"):
            return None  # system-level (layer 1 territory)
    return current_kg


def authorize_kg(kg_role: str, statement) -> None:
    """Layer-2 check: may `kg_role` run `statement` on its KG
    (auth.rs:183-324)? Raises PermissionError when not."""
    from inputlayer_spark.ast_nodes import MetaCommand, Query, Rule

    if kg_role == "owner":
        return
    if isinstance(statement, MetaCommand):
        args = list(statement.args)
        sub = args[0] if args else ""
        if statement.command == "kg":
            if sub == "drop":
                raise PermissionError(
                    "Permission denied: only KG owners can drop this "
                    "knowledge graph"
                )
            if sub == "acl" and len(args) > 1 and args[1] in ("grant", "revoke"):
                raise PermissionError(
                    "Permission denied: only KG owners can manage ACLs"
                )
        if kg_role == "editor":
            return
        # viewer: read-only meta shapes only
        if (statement.command, sub) in _VIEWER_META or (
            statement.command,
            "",
        ) in _VIEWER_META:
            return
        raise PermissionError(
            "Permission denied: you have viewer access to this knowledge graph"
        )
    if kg_role == "editor":
        return
    # viewer: queries and ephemeral session rules only
    if isinstance(statement, Query):
        return
    if isinstance(statement, Rule) and not getattr(statement, "persistent", True):
        return
    raise PermissionError(
        "Permission denied: you have viewer access to this knowledge graph"
    )
