# Shared TPU lock protocol (source me).  Mirrors bench.py's
# acquire_tpu_lock(): mkdir lock at /tmp/tnqs_tpu.lock with the holder's
# pid recorded in owner; steal dead-holder (or owner-less >3h) locks by
# atomically renaming the dir aside (mv picks exactly one winner) before
# removing it; release only if we still own it.
LOCK=/tmp/tnqs_tpu.lock

lock_stale() {
  local pid
  pid=$(cat "$LOCK/owner" 2>/dev/null)
  if [ -n "$pid" ]; then
    kill -0 "$pid" 2>/dev/null && return 1
    return 0 # recorded holder is dead
  fi
  # no owner recorded (pre-write window or legacy lock): 3h mtime fallback
  [ "$(( $(date +%s) - $(stat -c %Y "$LOCK" 2>/dev/null || date +%s) ))" -gt 10800 ]
}

with_lock() {
  local rc grave
  while ! mkdir "$LOCK" 2>/dev/null; do
    if lock_stale; then
      grave="$LOCK.stale.$$"
      if mv "$LOCK" "$grave" 2>/dev/null; then rm -rf "$grave"; fi
      continue
    fi
    sleep 30
  done
  echo $$ >"$LOCK/owner"
  "$@"
  rc=$?
  [ "$(cat "$LOCK/owner" 2>/dev/null)" = "$$" ] && rm -rf "$LOCK"
  return $rc
}
