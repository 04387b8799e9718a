"""Persistent TPU experiment worker: pays the per-session init once,
then execs <workdir>/cmd/<n>.py files as they appear (result ->
<workdir>/out/<n>.log).  Shared globals persist across commands (ns dict).

Why: on the remote-TPU (axon) backend every fresh python process pays a
lazy device->host transfer-path init measured at 11-360 s, plus per-graph
executable loads.  Iterating on perf with one process per experiment is
hopeless; this worker pays the init ONCE and then runs experiment
snippets in seconds.  importlib.reload() of edited ccrs_tpu modules works
from snippets (jit graphs re-hit the .xla_cache).

The work dir defaults to ``$TMPDIR/ccrs_worker.<uid>`` (0700, ownership
verified before adopting a pre-existing one) — the worker execs arbitrary
python, so it must never pick commands out of a directory another local
user could have pre-created or can write to.  CCRS_WORKER_DIR overrides.

Usage:
    nohup python tools/tpu_worker.py > /tmp/worker.log 2>&1 &
    # the worker prints its cmd/out dirs and touches <workdir>/ready
    # ATOMIC submission: write to a non-.py temp name, then rename
    cat > "$WORKDIR/cmd/.01_demo.tmp" <<'EOF'
    import jax.numpy as jnp
    print((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum())
    EOF
    mv "$WORKDIR/cmd/.01_demo.tmp" "$WORKDIR/cmd/01_demo.py"
    # result appears in <workdir>/out/01_demo.log; files run in sorted order
"""
import contextlib
import io
import os
import stat
import sys
import time
import traceback

WORKDIR = os.environ.get("CCRS_WORKER_DIR") or os.path.join(
    os.environ.get("TMPDIR", "/tmp"), f"ccrs_worker.{os.getuid()}"
)


def _secure_dir(path: str) -> None:
    """mkdir 0700; if it already exists, refuse to adopt one owned by a
    different uid or writable by group/other (arbitrary-code-exec sink)."""
    try:
        os.mkdir(path, 0o700)
        return
    except FileExistsError:
        pass
    st = os.lstat(path)
    if not stat.S_ISDIR(st.st_mode) or stat.S_ISLNK(st.st_mode):
        raise SystemExit(f"{path} exists and is not a plain directory")
    if st.st_uid != os.getuid():
        raise SystemExit(f"{path} is owned by uid {st.st_uid}, not us; "
                         "set CCRS_WORKER_DIR to a fresh private path")
    if st.st_mode & (stat.S_IWGRP | stat.S_IWOTH):
        raise SystemExit(f"{path} is group/other-writable; chmod 700 it "
                         "or set CCRS_WORKER_DIR")


_secure_dir(WORKDIR)
CMD = os.path.join(WORKDIR, "cmd")
OUT = os.path.join(WORKDIR, "out")
_secure_dir(CMD)
_secure_dir(OUT)

t0 = time.time()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["CCRS_TIMING"] = "1"
os.environ["CCRS_TIMING_SPANS"] = "1"
import numpy as np
import jax, jax.numpy as jnp
# prime d2h + h2d transfer paths (lazy init measured at up to 340 s/session)
x = jnp.ones((8, 8), jnp.float32)
np.asarray(x * 2)
jnp.asarray(np.zeros((8, 8), np.float32)).block_until_ready()
print(f"[worker] primed in {time.time()-t0:.1f}s; cmd dir: {CMD}", flush=True)

ns = {"np": np, "jax": jax, "jnp": jnp, "time": time}
done = set()
open(os.path.join(WORKDIR, "ready"), "w").write("ok")
while True:
    for f in sorted(os.listdir(CMD)):
        # only *.py runs — submit atomically by writing a temp name and
        # renaming into place; the mtime-quiet check is a belt-and-braces
        # fallback for direct `cat >` writers
        if not f.endswith(".py") or f in done:
            continue
        path = os.path.join(CMD, f)
        try:
            if time.time() - os.path.getmtime(path) < 1.0:
                continue
        except OSError:
            continue
        done.add(f)
        out = io.StringIO()
        t1 = time.time()
        try:
            src = open(path).read()
            with contextlib.redirect_stdout(out), contextlib.redirect_stderr(out):
                exec(compile(src, f, "exec"), ns)
            status = "ok"
        except SystemExit:
            raise
        except Exception:
            out.write(traceback.format_exc())
            status = "err"
        body = out.getvalue()
        with open(os.path.join(OUT, f[:-3] + ".log"), "w") as fh:
            fh.write(f"[{status} {time.time()-t1:.1f}s]\n{body}")
        print(f"[worker] {f}: {status} {time.time()-t1:.1f}s", flush=True)
    time.sleep(0.5)
