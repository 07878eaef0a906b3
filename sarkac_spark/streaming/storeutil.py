"""Crash-safe directory swap for the parquet maintenance stores.

The streaming stores (IncrementalDedupPipeline, IvfMaintenancePipeline)
periodically rewrite a whole store directory during ``compact()``. A
naive ``rmtree(store); move(tmp, store)`` has a window where a crash
leaves NO store at all — and because "store missing" is the legitimate
nothing-committed-yet state, the next trigger would silently treat a
half-compacted corpus as EMPTY and commit batches undeduped (permanent
damage; see ``incremental_dedup._EMPTY_STORE_CLASSES``).

``atomic_swap`` closes the window: the old store is moved ASIDE first
(``store + ".old"``), the new data moved into place, and only then is
the old copy deleted. Every intermediate crash state is recoverable and
— critically — DETECTABLE: if ``store`` is missing but ``store.old``
exists, the swap died mid-flight, and readers must fail loudly instead
of taking the quiet empty-corpus path. ``raise_if_half_swapped`` is
that guard; the store pipelines call it on their EMPTY-read branch only
(the hot read path stays a pure Spark read — no driver-local existence
probe on healthy stores, per the signature-store contract).

Local-filesystem semantics (shutil renames). On an object store, run
the same rewrite as a batch job with a rename-capable committer.
"""

from __future__ import annotations

import os
import shutil


class HalfSwappedStoreError(RuntimeError):
    """A store directory swap crashed between 'old moved aside' and
    'new moved in': the store path is unreadable but ``<store>.old``
    holds the last complete copy. Recover by moving ``<store>.old``
    back to ``<store>`` (and deleting any leftover ``<store>.compact``
    temp), then re-running the compaction."""


def _old_path(store: str) -> str:
    return store.rstrip("/") + ".old"


def atomic_swap(tmp: str, store: str) -> None:
    """Replace ``store`` with ``tmp`` without any crash window in which
    the store reads as empty-but-healthy.

    Order: (1) old store aside to ``store.old``; (2) ``tmp`` into
    place; (3) delete ``store.old``. A crash after (1) leaves
    ``store.old`` behind, which ``raise_if_half_swapped`` turns into a
    loud error on the next read; a crash after (2) leaves only a stale
    ``.old`` dir that the next swap (or a re-run) cleans up, with the
    store itself already complete and readable.
    """
    old = _old_path(store)
    if os.path.exists(old):
        if os.path.exists(store):
            # prior swap completed steps 1-2 but died before 3: the
            # store is whole; the .old copy is superseded garbage.
            shutil.rmtree(old)
        else:
            raise HalfSwappedStoreError(
                f"store swap previously crashed mid-flight: {store!r} is "
                f"missing but {old!r} exists; move {old!r} back to "
                f"{store!r} before compacting"
            )
    if os.path.exists(store):
        shutil.move(store, old)
    try:
        shutil.move(tmp, store)
    except BaseException:
        # tmp could not land: restore the old store so readers never
        # see the missing-store state from a still-running process.
        if not os.path.exists(store) and os.path.exists(old):
            shutil.move(old, store)
        raise
    if os.path.exists(old):
        shutil.rmtree(old)


def raise_if_half_swapped(store: str) -> None:
    """Loud-failure guard for the EMPTY-store read branch: a missing
    store is only legitimately empty when no ``store.old`` remnant
    exists. Call this AFTER a read failed with a nothing-committed-yet
    error class, never on the hot path."""
    if os.path.exists(_old_path(store)) and not os.path.exists(store):
        raise HalfSwappedStoreError(
            f"refusing to treat {store!r} as an empty store: "
            f"{_old_path(store)!r} exists, so a compaction swap crashed "
            f"mid-flight; restore it by moving the .old dir back"
        )
