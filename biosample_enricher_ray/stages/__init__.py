"""Stages: batch-level kernels and actor-pool classes composed into pipelines."""


def taskify(cls, /, **kwargs):
    """Wrap a callable-class stage into a task function with per-task
    construction memoized across the batches of one map task.

    Use for stages whose setup is cheap to rebuild (a zero-copy ``ray.get``
    of a broadcast ref, a small derived array): a task-based stage starts
    instantly on the session's long-lived workers, while an actor pool pays
    ~2.5 s of actor startup per pipeline invocation. Keep real actor pools
    for genuinely expensive setup (compiled check suites, loaded models).

    ObjectRefs in ``kwargs`` stay refs until the task runs, so broadcast
    payloads still travel through the object store, not the closure.
    """

    def fn(batch, _memo={}):
        inst = _memo.get("inst")
        if inst is None:
            inst = _memo["inst"] = cls(**kwargs)
        return inst(batch)

    # stable-ish name for Ray Data progress/stats displays
    fn.__name__ = getattr(cls, "__name__", "stage").lower() + "_task"
    return fn
