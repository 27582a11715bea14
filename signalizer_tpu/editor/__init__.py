"""Interactive editor shell (browser UI) for an AnalysisSession.

The reference's editor layer (MainEditor window + SignalizerDesign widget
kit + per-view Controllers + GraphEditor) rebuilt as a dependency-free
web app: :mod:`widgets` resolves the controller layouts against live
parameters, :mod:`server` serves the app + JSON API and drives the tick
loop, :mod:`static` is the page. Launch with::

    python -m signalizer_tpu editor            # demo signal source
    # or embed:
    shell = EditorShell(session, source=my_block_source)
    shell.start(); print(shell.url)
"""

from signalizer_tpu.editor.server import EditorShell
from signalizer_tpu.editor.widgets import describe_pages, resolve_control, tier_of

__all__ = ["EditorShell", "describe_pages", "resolve_control", "tier_of"]
