"""SFTP fetch utilities (SURVEY.md §2a S1-S5) — driver-side network
I/O that stages remote CSV extracts for the bronze ingest.

Re-designed from the reference's observable behavior
(mm_source_to_bronze.py:32-47,57-79,101; linehaul_source_to_bronze.py:
19-34,47-62) with its defects fixed:

- retries with backoff, keepalive (as the reference);
- chunked download with progress callback (reference S2);
- timeout via socket timeout on the transport — NOT a zombie thread
  (fixes §2d-5: the reference joins a thread and abandons it);
- everything behind the ``FileFetcher`` protocol so tests (and
  non-SFTP deployments) inject a local-directory fetcher.

paramiko is optional (not shipped in this container) — gated import;
instantiating SftpFetcher without it raises with a clear message.
Secrets come from the caller/environment, never hardcoded (reference
Q3 keeps them in a secret scope; this engine takes a dict).
"""

from __future__ import annotations

import os
import shutil
import time
from collections.abc import Callable
from dataclasses import dataclass

try:  # pragma: no cover - environment-dependent
    import paramiko  # type: ignore

    HAVE_PARAMIKO = True
except ImportError:  # pragma: no cover
    paramiko = None
    HAVE_PARAMIKO = False

CHUNK_SIZE = 5_000_000  # reference parity: 5 MB blocks (mm_source_to_bronze.py:57)


class HostKeyMismatch(ConnectionError):
    """Pinned host-key fingerprint did not match; raised pre-auth and
    never retried (retrying would re-offer the password to the MITM)."""


def _pinned_key_policy(expected_hex: str):
    """MissingHostKeyPolicy verifying sha256(key) == pin during
    connect()'s key exchange — i.e. before password auth begins."""
    import hashlib

    class _Pinned(paramiko.MissingHostKeyPolicy):
        def missing_host_key(self, client, hostname, key):
            got = hashlib.sha256(key.asbytes()).hexdigest()
            if got != expected_hex:
                raise HostKeyMismatch(
                    f"host key fingerprint mismatch for {hostname}: "
                    f"expected {expected_hex}, got {got}"
                )
            # match → accept for this session only (not persisted)

    return _Pinned()


@dataclass
class SftpConfig:
    host: str
    port: int
    username: str
    password: str
    remote_dir: str  # e.g. /PILOT/MM/ vs /PILOT/Linehaul/ (the dataset switch)
    retries: int = 3
    retry_sleep_s: float = 5.0
    keepalive_s: int = 30
    timeout_s: float = 200.0
    # Host-key verification. The reference uses AutoAddPolicy
    # (mm_source_to_bronze.py:38) — trusting any key on first contact,
    # a MITM exposure amplified by password auth. Default here is
    # REJECT unknown hosts (system known_hosts are loaded). A pinned
    # fingerprint (hex sha256 of the key blob) takes precedence over
    # the policy and is verified BEFORE authentication — the password
    # is never sent to a host whose key doesn't match the pin — and a
    # mismatch is terminal, never retried.
    host_key_policy: str = "reject"  # 'reject' | 'auto_add'
    host_key_fingerprint: str | None = None


class LocalFetcher:
    """Test/local stand-in: 'remote' files live in a local directory."""

    def __init__(self, src_dir: str):
        self.src_dir = src_dir

    def exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self.src_dir, name))

    def fetch(self, name: str, local_path: str,
              progress: Callable[[int, int], None] | None = None) -> str:
        src = os.path.join(self.src_dir, name)
        os.makedirs(os.path.dirname(local_path), exist_ok=True)
        shutil.copyfile(src, local_path)
        if progress:
            size = os.path.getsize(local_path)
            progress(size, size)
        return local_path


class SftpFetcher:
    """paramiko-backed fetcher (reference S1-S4 behavior)."""

    def __init__(self, cfg: SftpConfig):
        if not HAVE_PARAMIKO:
            raise ImportError(
                "paramiko is not installed in this environment; "
                "use LocalFetcher or install paramiko on the cluster"
            )
        self.cfg = cfg
        self._client = None
        self._sftp = None

    def _connect(self):
        last_err: Exception | None = None
        for attempt in range(self.cfg.retries):
            try:
                client = paramiko.SSHClient()
                if self.cfg.host_key_fingerprint is not None:
                    # Pin governs: skip known_hosts so the policy is
                    # ALWAYS consulted, and verify during connect()'s
                    # key exchange — before the password is sent.
                    client.set_missing_host_key_policy(
                        _pinned_key_policy(self.cfg.host_key_fingerprint.lower())
                    )
                else:
                    client.load_system_host_keys()
                    if self.cfg.host_key_policy == "auto_add":
                        client.set_missing_host_key_policy(paramiko.AutoAddPolicy())
                    else:
                        client.set_missing_host_key_policy(paramiko.RejectPolicy())
                try:
                    client.connect(
                        self.cfg.host,
                        port=self.cfg.port,
                        username=self.cfg.username,
                        password=self.cfg.password,
                        timeout=self.cfg.timeout_s,
                    )
                except HostKeyMismatch:
                    # the transport negotiated during key exchange is
                    # live — don't leak an open socket to the suspect host
                    client.close()
                    raise
                transport = client.get_transport()
                transport.set_keepalive(self.cfg.keepalive_s)
                # socket-level timeout bounds every blocking op — no
                # orphan threads (unlike linehaul_source_to_bronze.py:55-62)
                transport.sock.settimeout(self.cfg.timeout_s)
                self._client, self._sftp = client, client.open_sftp()
                return
            except HostKeyMismatch:
                raise  # terminal: never re-offer credentials on a bad pin
            except Exception as e:  # noqa: BLE001 — retry any connect error
                last_err = e
                try:
                    # auth failures / post-kex timeouts leave a live
                    # transport on the client — close before retrying
                    # or each failed attempt leaks a socket until GC
                    client.close()
                except Exception:  # noqa: BLE001
                    pass
                time.sleep(self.cfg.retry_sleep_s)
        raise ConnectionError(f"sftp connect failed after {self.cfg.retries} tries") from last_err

    def _ensure(self):
        if self._sftp is None:
            self._connect()
        return self._sftp

    def exists(self, name: str) -> bool:
        """Remote existence probe (reference S4)."""
        try:
            self._ensure().stat(os.path.join(self.cfg.remote_dir, name))
            return True
        except FileNotFoundError:
            return False

    def fetch(self, name: str, local_path: str,
              progress: Callable[[int, int], None] | None = None) -> str:
        """Chunked download (reference S2): 5 MB reads with progress."""
        sftp = self._ensure()
        remote = os.path.join(self.cfg.remote_dir, name)
        os.makedirs(os.path.dirname(local_path), exist_ok=True)
        size = sftp.stat(remote).st_size
        done = 0
        with sftp.open(remote, "rb") as rf, open(local_path, "wb") as lf:
            rf.prefetch()
            while True:
                chunk = rf.read(CHUNK_SIZE)
                if not chunk:
                    break
                lf.write(chunk)
                done += len(chunk)
                if progress:
                    progress(done, size)
        return local_path

    def close(self):
        for h in (self._sftp, self._client):
            try:
                if h:
                    h.close()
            except Exception:  # noqa: BLE001
                pass
