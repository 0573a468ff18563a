"""Micro-batching ergonomics — the reference's one batching knob.

``@batch_process(wait, limit)`` (/root/reference/motorway/
decorators.py:5-11) tags an intersection's process method so the engine
feeds it batches of at most ``limit`` messages at a cadence of ``wait``
seconds. The attribute names (``batch_process``/``wait``/``limit``)
match the reference so user code ports unchanged.

Spark mapping: micro-batching is a QUERY property, not a per-operator
one — ``wait`` becomes ``Trigger.ProcessingTime(wait seconds)`` on the
sink and ``limit`` is pushed down to the ramp's per-trigger cap option
(``batchSize`` / ``maxFilesPerTrigger`` / ``getRecordsLimit`` /
``maxOffsetsPerTrigger``), which is where rate limiting must live at
scale: capping at the source bounds state-store growth and shuffle size
per micro-batch; capping at an operator would only buffer upstream.
When several tagged intersections share one query, the strictest
(smallest) wait and limit win — see ``Pipeline.run``.
"""

from __future__ import annotations


def batch_process(wait: float = 5, limit: int = 100):
    """Tag a process method/callable with micro-batch preferences."""

    def inner(method):
        method.batch_process = True
        method.wait = wait
        method.limit = limit
        return method

    return inner


def post_error_to_sentry(client):
    """Error-reporting decorator (/root/reference/motorway/
    decorators.py:14-31). In the reference this API is dead: it sets the
    ``post_error_to_sentry`` attribute that nothing reads, and the
    capture-and-reraise body is commented out. This twin keeps the
    attribute contract AND implements what that body intended: report
    the exception to the client, then re-raise so the failure semantics
    (message fail → source retry; here: task fail → Spark retry /
    batch replay) are unchanged. ``client`` is anything with a
    ``captureException()`` method — the raven/sentry-SDK surface."""

    def inner(method):
        import functools

        @functools.wraps(method)
        def wrapper(*args, **kwargs):
            try:
                return method(*args, **kwargs)
            except Exception:
                try:
                    client.captureException()
                except Exception:  # reporting must never mask the error
                    pass
                raise

        wrapper.post_error_to_sentry = True
        return wrapper

    return inner
