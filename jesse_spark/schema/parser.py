"""JSON-Schema parsing, draft dispatch, canonicalization, $ref resolution.

Mirrors the reference's driver-side schema machinery:

- draft dispatch on the ``$schema`` URI with draft6 as the default
  (jesse_schema_validator.erl:82-98; default at
  jesse_schema_validator.hrl:99);
- boolean-schema canonicalization ``true -> {}``, ``false -> {"not": {}}``
  (jesse_validator_draft6.erl:1206-1211);
- ``$ref`` hoisting: when a schema contains ``$ref`` the sibling
  keywords are suppressed (jesse_state.erl:176-196,
  jesse_validator_draft4.erl:86-87);
- schema registry keyed by ``$id`` / ``id`` — the in-memory analog of
  jesse's ETS store (jesse_database.erl:60-177), but plan compilation
  happens once on the driver so a plain dict suffices;
- JSON-Pointer resolution incl. ~0/~1 unescaping
  (jesse_json_path.erl:38-42, 301-327).

Everything here is pure Python: schemas are compiled on the driver
before any Spark job is launched.
"""

from __future__ import annotations

import json
import urllib.parse
from pathlib import Path
from typing import Any

from jesse_spark.errors import SchemaError

DRAFT3 = 3
DRAFT4 = 4
DRAFT6 = 6

# jesse_schema_validator.hrl:96-98
_DRAFT_URIS = {
    "http://json-schema.org/draft-03/schema": DRAFT3,
    "http://json-schema.org/draft-04/schema": DRAFT4,
    "http://json-schema.org/draft-06/schema": DRAFT6,
}
DEFAULT_DRAFT = DRAFT6  # jesse_schema_validator.hrl:99


def detect_draft(schema: Any, default: int = DEFAULT_DRAFT) -> int:
    """Dispatch on $schema like jesse_schema_validator.erl:82-98."""
    if isinstance(schema, dict):
        uri = schema.get("$schema")
        if isinstance(uri, str):
            base = uri.split("#", 1)[0].rstrip("/")
            if base in _DRAFT_URIS:
                return _DRAFT_URIS[base]
            raise SchemaError("schema_unsupported", uri)
    return default


def normalize_schema(schema: Any, draft: int) -> dict:
    """Canonicalize a schema node to a dict.

    Boolean schemas (draft6 only): true ≡ {} and false ≡ {"not": {}}
    (jesse_validator_draft6.erl:1206-1211, entered at :285-291).
    """
    if isinstance(schema, bool):
        if draft < DRAFT6:
            raise SchemaError("schema_invalid", schema)
        return {} if schema else {"not": {}}
    if isinstance(schema, dict):
        return schema
    raise SchemaError("schema_invalid", schema)


def _unescape_pointer_token(tok: str) -> str:
    # jesse_json_path.erl:38-42 — %XX then ~1 then ~0
    tok = urllib.parse.unquote(tok)
    return tok.replace("~1", "/").replace("~0", "~")


def _combine_node_id(node: Any, scope: str | None) -> str | None:
    """Fold a traversed node's own ``$id``/``id`` into the scope
    (fragment-only anchors don't change the base URI)."""
    if isinstance(node, dict):
        for tag in ("$id", "id"):
            sid = node.get(tag)
            if isinstance(sid, str) and sid and not sid.startswith("#"):
                return combine_id(scope, sid)
    return scope


def resolve_pointer(doc: Any, pointer: str,
                    scope: str | None = None) -> tuple[Any, str | None]:
    """Walk a JSON Pointer (RFC 6901) inside a schema document,
    combining the ``$id``/``id`` of every traversed ANCESTOR into the
    base-URI scope — the spec's base-URI-change-in-subschema rule.
    The target node's own id is NOT combined here (the compiler's
    per-descent ``_scoped`` handles it, avoiding double-combination).
    Returns ``(node, scope)``.

    Mirrors jesse_state.erl:262-303 (load_local_schema); the ancestor
    scope fold is an EXTENSION — jesse skip-lists the suite groups
    that need it (draft6 "base URI change - change folder in
    subschema", jesse_tests_draft6_SUITE.erl:56).
    """
    if pointer in ("", "#"):
        return doc, scope
    if pointer.startswith("#"):
        pointer = pointer[1:]
    node = doc
    for raw in [t for t in pointer.split("/") if t != ""]:
        scope = _combine_node_id(node, scope)
        tok = _unescape_pointer_token(raw)
        if isinstance(node, dict):
            if tok not in node:
                raise SchemaError("schema_not_found", pointer)
            node = node[tok]
        elif isinstance(node, list):
            try:
                node = node[int(tok)]
            except (ValueError, IndexError):
                raise SchemaError("schema_not_found", pointer)
        else:
            raise SchemaError("schema_not_found", pointer)
    return node, scope


# ---------------------------------------------------------------------------
# base-URI scope combination (jesse_state.erl:308-390)
# ---------------------------------------------------------------------------
def _is_absolute_ref(ref: str) -> bool:
    """A ref with a URI scheme is absolute (jesse_state.erl:420-428
    parse_ref via uri_string:parse)."""
    return bool(urllib.parse.urlsplit(ref).scheme)


def _raw_canonical_path(path: str) -> list[str]:
    """Split on / or \\ and resolve ``.`` / ``..`` segments
    (jesse_state.erl:377-390 raw_canonical_path).  Unlike the Erlang
    (whose ``tl([])`` crashes), excess ``..`` at the root is dropped."""
    out: list[str] = []
    for seg in path.replace("\\", "/").split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out:
                out.pop()
            continue
        out.append(seg)
    return out


def _canonical_path(path: str, hint: str) -> str:
    """Canonical URI for a combined path (jesse_state.erl:358-374)."""
    for scheme in ("file", "http", "https"):
        pre = scheme + "://"
        if path.startswith(pre):
            return pre + "/".join(_raw_canonical_path(path[len(pre):]))
        if hint.startswith(scheme + ":"):
            return pre + "/".join(_raw_canonical_path(path))
    # scheme-less → absolute file path (jesse_state.erl:373-374 absname)
    import os

    return "file://" + "/".join(_raw_canonical_path(os.path.abspath(path)))


def _dirname(uri: str) -> str:
    # filename:dirname analog: strip the last /-component; no slash → "."
    d = uri.rsplit("/", 1)[0] if "/" in uri else "."
    # "scheme://host" (no path) → Erlang's dirname collapses to "scheme:"
    if d in ("file:/", "http:/", "https:/"):
        return d[:-1]
    return d


def _combine_relative_id(base: str | None, rel: str) -> str:
    """jesse_state.erl:325-355 combine_relative_id/2."""
    if base is None:
        return rel
    if rel.startswith("#"):
        # fragment-only ref: replace the base's fragment
        return base.split("#", 1)[0] + rel
    d = _dirname(base)
    for scheme in ("file", "http", "https"):
        if d == scheme + ":":
            return _canonical_path(rel, scheme + ":")
        pre = scheme + "://"
        if d.startswith(pre):
            return _canonical_path(pre + d[len(pre):] + "/" + rel, scheme + ":")
    if d == ".":
        return _canonical_path(rel, "file:")
    return _canonical_path(d + "/" + rel, "file:")


def combine_id(base: str | None, ref: str | None) -> str | None:
    """Combine a (possibly relative) ``$ref`` / ``$id`` against the
    current base-URI scope — jesse_state.erl:308-322 combine_id/2.

    Absolute refs replace the scope; ``#frag`` swaps the fragment;
    other relative refs resolve against dirname(scope) with ``.``/``..``
    canonicalization."""
    if ref is None:
        return base
    ref = str(ref)
    if _is_absolute_ref(ref):
        return ref
    return _combine_relative_id(base, ref)


def file_loader(uri: str) -> Any | None:
    """Default URI loader: ``file://`` only
    (jesse_database.erl:305-314)."""
    if uri.startswith("file://"):
        p = Path(uri[len("file://"):])
        if p.exists():
            return json.loads(p.read_text())
    return None


def http_loader(uri: str) -> Any | None:
    """Opt-in loader covering file:// AND http(s):// — the analog of
    jesse's httpc fetch (jesse_database.erl:316-336).  Not the default:
    a plan compile must not silently depend on a remote server."""
    got = file_loader(uri)
    if got is not None:
        return got
    if uri.startswith(("http://", "https://")):
        from urllib.request import urlopen

        with urlopen(uri, timeout=10) as r:
            return json.loads(r.read().decode("utf-8"))
    return None


class SchemaRegistry:
    """Driver-side schema store — the analog of jesse's ETS database
    (jesse_database.erl:60-177).

    Keyed by canonical ``$id`` (draft6) / ``id`` (draft3/4), like
    jesse_database:load/1 (jesse_database.erl:109-125).  Unresolved
    ``file://`` / ``http(s)://`` refs go through a pluggable
    ``loader_fun`` — jesse's schema_loader_fun option (jesse.erl:89-92)
    over its URI loaders (jesse_database.erl:305-336).  The default
    loader handles ``file://`` only; pass ``loader_fun=http_loader`` to
    opt into network fetches (schemas normally ship WITH the job — a
    trillion-row run must not depend on a remote server at plan time).
    """

    def __init__(self, loader_fun=None) -> None:
        self._by_id: dict[str, Any] = {}
        self._loader = loader_fun if loader_fun is not None else file_loader

    @staticmethod
    def _id_of(schema: Any, draft: int) -> str | None:
        if not isinstance(schema, dict):
            return None
        # draft4 rejects "$id", draft6 rejects "id"
        # (jesse_validator_draft4.erl:84-85 / _draft6.erl:86-87)
        key = "$id" if draft >= DRAFT6 else "id"
        wrong = "id" if draft >= DRAFT6 else "$id"
        if wrong in schema and key not in schema:
            raise SchemaError(
                "wrong_draft%d_id_tag" % (6 if draft >= DRAFT6 else 4), schema.get(wrong)
            )
        v = schema.get(key)
        return v.rstrip("#") if isinstance(v, str) else None

    def add(self, schema: Any, *, uri: str | None = None, draft: int | None = None) -> str:
        draft = detect_draft(schema) if draft is None else draft
        sid = self._id_of(schema, draft) or uri
        if sid is None:
            raise SchemaError("schema_invalid", "schema has no $id/id and no uri given")
        self._by_id[sid] = schema
        return sid

    def add_file(self, path: str | Path) -> str:
        p = Path(path)
        schema = json.loads(p.read_text())
        # synthetic file:// id if absent, like jesse_cli.erl:99-123
        return self.add(schema, uri=f"file://{p.resolve()}")

    def add_dir(self, path: str | Path) -> list[str]:
        """Recursive directory load (jesse_database.erl:96-103, 251-302)."""
        return [self.add_file(p) for p in sorted(Path(path).rglob("*.json"))]

    def load(self, key: str) -> Any:
        key = key.rstrip("#")
        if key not in self._by_id:
            # cache-miss: try the URI loader, then cache under the key
            # (jesse_database.erl:109-125 falls back to load_uri)
            loaded = self._loader(key) if self._loader else None
            if loaded is None:
                raise SchemaError("schema_not_found", key)
            self._by_id[key] = loaded
        return self._by_id[key]

    def resolve_ref(self, ref: str, root: Any,
                    scope: str | None = None) -> tuple[Any, Any, str | None]:
        """Resolve a $ref against the current scope, root document, or
        the store — jesse_state.erl:206-250 resolve_ref/2.

        The ref is first combined against the current base-URI ``scope``
        (:func:`combine_id`); the combined base is LOCAL when it equals
        the scope (or is empty with no scope) — then the pointer walks
        the current root document.  Otherwise the base is loaded from
        the store / loader and becomes the new root + scope (the
        remote-document switch at jesse_state.erl:230-241).

        Returns ``(target, new_root, new_scope)`` so the compiler can
        keep resolving nested refs inside the loaded document.
        """
        canonical = combine_id(scope, ref) or ""
        base, _, frag = canonical.partition("#")
        # Locality: compare against the scope with its own fragment
        # stripped — an $id like "http://h/s.json#anchor" still scopes
        # purely-local "#/..." refs to the current root.  An empty ref
        # always means "this document" (jesse_state.erl:206-214).
        scope_base = (scope or "").partition("#")[0]
        is_local = (ref == "") or \
            ((base == "") if scope is None else (base == scope_base))
        # A non-pointer fragment is a location-independent identifier
        # (an embedded "$id": "#anchor" / "id": "#anchor").  jesse
        # skip-lists these suite groups outright
        # (jesse_tests_draft4_SUITE.erl:50-55); we resolve them by
        # scanning the current root and every stored document for the
        # matching embedded id.
        if frag and not frag.startswith("/"):
            hit = self._embedded_lookup(canonical, root, scope)
            if hit is None and base and base != scope_base:
                # the anchor may live in a document the loader can
                # still fetch (file://... etc.) — load, then scan it
                try:
                    loaded = self.load(base)
                except SchemaError:
                    loaded = None
                if loaded is not None:
                    for uri, node, _enc in iter_embedded_ids(loaded, base):
                        if uri == canonical:
                            hit = (node, loaded, base)
                            break
            if hit is not None:
                return hit
            raise SchemaError("schema_not_found", ref)
        if is_local:
            doc, new_root, new_scope = root, root, scope
        else:
            try:
                doc = self.load(base)
            except SchemaError:
                # the base may be an embedded subschema document (an
                # "$id" that changes the base URI inside another doc)
                hit = self._embedded_lookup(canonical, root, scope)
                if hit is not None:
                    return hit
                raise
            new_root, new_scope = doc, base
        if frag:
            target, new_scope = resolve_pointer(doc, "#" + frag, new_scope)
        else:
            target = doc
        return target, new_root, new_scope

    def _embedded_lookup(self, canonical: str, root: Any,
                         scope: str | None):
        """Find the subschema ``canonical`` names via an embedded
        ``$id``/``id`` — first in the current root document, then in
        every stored document.  Matches the exact canonical (anchor
        form, e.g. ``http://h/sub#foo``); failing that, matches the
        BASE against an embedded id and pointer-walks the fragment
        inside the matched node (``http://h/sub#/definitions/d`` into
        an embedded document ``{"$id": "http://h/sub", ...}``).
        Returns ``(target, new_root, new_scope)`` or None."""
        base, _, frag = canonical.partition("#")
        docs = [(root, (scope or "").partition("#")[0] or None)]
        docs += [(d, k) for k, d in self._by_id.items() if d is not root]
        for doc, doc_scope in docs:
            for uri, node, enclosing in iter_embedded_ids(doc, doc_scope):
                if uri == canonical:
                    return node, doc, (base or enclosing or doc_scope)
                if frag.startswith("/") and base and uri == base:
                    try:
                        target, walked = resolve_pointer(node, "#" + frag,
                                                         base)
                    except SchemaError:
                        continue
                    return target, doc, walked
        return None


def iter_embedded_ids(doc: Any, base: str | None):
    """Yield ``(canonical_uri, subschema, enclosing_scope)`` for every
    embedded ``$id``/``id`` in ``doc``, each combined against its
    enclosing scope (RFC: an id establishes a new base URI for its
    subtree).  Ids inside ``enum``/``const`` are DATA, not identifiers
    (the draft6 id.json suite group), and are not yielded.

    jesse has no analog — it skip-lists every location-independent-
    identifier suite group (jesse_tests_draft4_SUITE.erl:50-55); this
    engine resolves them.
    """
    def walk(node: Any, scope: str | None):
        if isinstance(node, dict):
            new_scope = scope
            for tag in ("$id", "id"):
                sid = node.get(tag)
                if isinstance(sid, str) and sid:
                    if sid.startswith("#"):
                        canonical = ((scope or "").partition("#")[0]) + sid
                        yield canonical, node, scope
                    else:
                        canonical = combine_id(scope, sid) or sid
                        yield canonical, node, scope
                        new_scope = canonical
                    break
            for k, v in node.items():
                if k in ("enum", "const"):
                    continue
                yield from walk(v, new_scope)
        elif isinstance(node, list):
            for v in node:
                yield from walk(v, scope)

    yield from walk(doc, base)


def hoist_ref(schema: dict) -> dict:
    """$ref short-circuits sibling keywords (except definitions stay
    addressable) — jesse rewrites the attr list so $ref comes first and
    validation stops after it (jesse_state.erl:176-196).  We model the
    same by *dropping* sibling keywords at compile time."""
    if "$ref" in schema and len(schema) > 1:
        return {"$ref": schema["$ref"]}
    return schema
