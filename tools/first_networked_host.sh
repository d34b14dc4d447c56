#!/bin/bash
# First-networked-host acceptance run (docs/NETWORKED_TODO.md items 1-3,
# executable form). Emits a machine-readable pass/fail JSON report; offline it
# dry-runs each leg to its first network call and exits 0 with
# BLOCKED_OFFLINE statuses. See tools/first_networked_host.py for details.
exec python "$(dirname "$0")/first_networked_host.py" "$@"
