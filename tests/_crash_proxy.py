"""Shared crash-injection proxy for the crash-point sweeps (one copy
— the two sweeps must not diverge in mutation coverage)."""


class Boom(RuntimeError):
    pass


class CrashingFs:
    """Wraps a py4j Hadoop FileSystem: raises Boom when the mutation
    budget runs out. Reads (exists/listStatus/open/getFileStatus...)
    pass through untouched."""

    MUTATORS = ("rename", "delete", "mkdirs", "create")

    def __init__(self, fs, budget):
        self._fs = fs
        self._budget = budget

    def __getattr__(self, name):
        attr = getattr(self._fs, name)
        if name not in self.MUTATORS:
            return attr

        def guarded(*a, **k):
            if self._budget[0] <= 0:
                raise Boom(f"injected crash at fs.{name}")
            self._budget[0] -= 1
            return attr(*a, **k)

        return guarded
