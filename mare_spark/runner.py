"""Container/command executor for the pipe operators.

Two backends with identical command semantics (``sh -c <command>`` with the
input/output mounts visible at their mount paths — DockerHelper.scala:104):

* ``subprocess`` (default, CI-safe): runs ``sh -c`` on the host. The bind
  mount is emulated by substituting each container mount path with its host
  temp path in the command string (the subprocess equivalent of a bind
  mount). Matches the reference's ``sh -c`` entrypoint without needing a
  Docker daemon — the same split the reference uses for its CI-excluded
  Docker tests (pom.xml:162-169).
* ``docker``: real ``docker run`` with ``-v host:mount`` binds, pull-once
  image caching (DockerHelper.scala:80-89), ``sh -c`` entrypoint
  (DockerHelper.scala:103-108), stdout/stderr forwarded to logs, and a
  non-zero exit raising so Spark retries the task
  (DockerHelper.scala:132-135). ``DOCKER_HOST``/TLS env vars are honored by
  the docker CLI itself (DockerHelper.scala:23-33 reads the same vars).

Backend selection: explicit argument > ``MARE_SPARK_BACKEND`` env > ``subprocess``.
"""

from __future__ import annotations

import logging
import os
import re
import shutil
import subprocess
import time

log = logging.getLogger(__name__)

# Pull-once cache, per python worker process (DockerHelper.scala:80-89 pulls
# only when the image is absent locally).
_pulled_images: set[str] = set()


class ContainerRunError(RuntimeError):
    """Non-zero exit from the piped command → Spark task failure → retry."""


def normalize_image_name(image: str) -> str:
    """Append ``:latest`` when no tag is given (DockerHelper.scala:51-64)."""
    last = image.rsplit("/", 1)[-1]
    return image if ":" in last else image + ":latest"


def resolve_backend(backend: str | None = None) -> str:
    backend = backend or os.environ.get("MARE_SPARK_BACKEND", "subprocess")
    if backend == "auto":
        backend = "docker" if docker_available() else "subprocess"
    if backend not in ("subprocess", "docker"):
        raise ValueError(f"unknown backend: {backend}")
    return backend


def docker_available() -> bool:
    if shutil.which("docker") is None:
        return False
    try:
        r = subprocess.run(
            ["docker", "info"], capture_output=True, timeout=10, check=False
        )
        return r.returncode == 0
    except Exception:
        return False


def run_container(
    image: str,
    command: str,
    binds: list[tuple[str, str]],
    *,
    force_pull: bool = False,
    backend: str | None = None,
) -> None:
    """Run ``sh -c command`` with each ``(host_path, mount_path)`` bind.

    Raises :class:`ContainerRunError` on non-zero exit (reference throws at
    DockerHelper.scala:132-135 so Spark's normal task retry kicks in).
    """
    backend = resolve_backend(backend)
    t0 = time.monotonic()
    if backend == "subprocess":
        _run_subprocess(command, binds)
    else:
        _run_docker(image, command, binds, force_pull)
    log.info(
        "pipe command took %d ms (backend=%s)",
        int((time.monotonic() - t0) * 1000),
        backend,
    )  # per-run wall-time parity with DockerHelper.scala:128-129


def _substitute_binds(command: str, binds: list[tuple[str, str]]) -> str:
    """Rewrite each container mount path to its host path — the subprocess
    equivalent of a bind mount. ONE pass with an alternation (longest
    mount first, so '/out2' is never clobbered by '/out'), bounded on
    BOTH sides: under real docker binds '/dna' and '/dna_0.fasta' are
    unrelated paths ('for f in /dna/dna_*.fasta' rewrites only the
    directory component), and '/scratch/out/x' does not contain the
    mount '/out' (the right-boundary-only form rewrote exactly that,
    silently redirecting unrelated paths). The single pass also means
    substituted HOST text is never re-scanned by a later mount — with
    tmp dirs nested under another mount's name, sequential replace
    corrupted the already-inserted host path."""
    if not binds:
        return command
    mapping = {mount: host for host, mount in binds}
    alts = "|".join(
        re.escape(m) for m in sorted(mapping, key=len, reverse=True)
    )
    rx = re.compile(
        r"(?<![A-Za-z0-9_.\-/])(?:" + alts + r")(?![A-Za-z0-9_.\-])"
    )
    return rx.sub(lambda m: mapping[m.group(0)], command)


def _tail_text(fh, limit: int = 4000) -> str:
    fh.seek(0, os.SEEK_END)
    size = fh.tell()
    fh.seek(max(0, size - limit))
    return fh.read().decode("utf-8", errors="replace")


def _run_streamed(args: list[str]) -> tuple[int, str, str]:
    """Run a command with stdout/stderr streamed to temp FILES, reading
    back only a bounded tail — ``capture_output=True`` would hold the
    full streams in executor memory, and a verbose tool over a multi-GB
    partition OOMs the worker (the reference streams container output
    incrementally to log4j, DockerHelper.scala AttachLoggingCallback)."""
    import tempfile

    with tempfile.TemporaryFile() as out, tempfile.TemporaryFile() as err:
        r = subprocess.run(args, stdout=out, stderr=err, check=False)
        return r.returncode, _tail_text(out), _tail_text(err)


def _run_subprocess(command: str, binds: list[tuple[str, str]]) -> None:
    cmd = _substitute_binds(command, binds)
    code, out_tail, err_tail = _run_streamed(["sh", "-c", cmd])
    if out_tail:
        log.info("pipe stdout: %s", out_tail)
    if err_tail:
        log.info("pipe stderr: %s", err_tail)
    if code != 0:
        raise ContainerRunError(
            f"command exited with code {code}: {command!r}\n{err_tail}"
        )


def _image_present(image: str) -> bool:
    r = subprocess.run(
        ["docker", "image", "inspect", image], capture_output=True, check=False
    )
    return r.returncode == 0


def _run_docker(
    image: str, command: str, binds: list[tuple[str, str]], force_pull: bool
) -> None:
    image = normalize_image_name(image)
    if force_pull or (image not in _pulled_images and not _image_present(image)):
        r = subprocess.run(["docker", "pull", image], capture_output=True, text=True, check=False)
        if r.returncode != 0:
            raise ContainerRunError(f"docker pull {image} failed: {r.stderr[-2000:]}")
    _pulled_images.add(image)

    args = ["docker", "run", "--rm"]
    for host, mount in binds:
        args += ["-v", f"{os.path.abspath(host)}:{mount}"]
    args += ["--entrypoint", "sh", image, "-c", command]
    code, out_tail, err_tail = _run_streamed(args)
    if out_tail:
        log.info("container stdout: %s", out_tail)
    if err_tail:
        log.info("container stderr: %s", err_tail)
    if code != 0:
        raise ContainerRunError(
            f"container exited with code {code}: {command!r}\n{err_tail}"
        )
