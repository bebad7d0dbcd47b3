"""Gradio wiring smoke test with a stub module (gradio isn't installed).

Catches wiring rot: components constructed, all three buttons bound with
input/output lists, examples quick-load populated from examples/."""
import os
import sys
import types

import numpy as np


class _Component:
    def __init__(self, *a, **kw):
        self.args = a
        self.kw = kw


class _Button(_Component):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.bound = None

    def click(self, fn, inputs, outputs):
        self.bound = (fn, inputs, outputs)


class _Ctx(_Component):
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _install_stub(monkeypatch):
    gr = types.ModuleType("gradio")
    created = {"examples": []}

    class Examples(_Component):
        def __init__(self, examples, inputs, label=None):
            created["examples"] = examples

    gr.Blocks = _Ctx
    gr.Row = _Ctx
    gr.Column = _Ctx
    gr.Markdown = _Component
    gr.Image = _Component
    gr.Textbox = _Component
    gr.Dropdown = _Component
    gr.Radio = _Component
    gr.Number = _Component
    gr.Slider = _Component
    gr.Button = _Button
    gr.Video = _Component
    gr.File = _Component
    gr.Examples = Examples
    monkeypatch.setitem(sys.modules, "gradio", gr)
    return created


def test_build_demo_wiring(monkeypatch, tmp_path):
    created = _install_stub(monkeypatch)
    import luciddreamer_tpu.app_gradio as ag

    buttons = []
    orig = sys.modules["gradio"].Button

    class TrackingButton(orig):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            buttons.append(self)

    sys.modules["gradio"].Button = TrackingButton

    demo = ag.build_demo(save_dir=str(tmp_path))
    assert demo is not None
    assert len(buttons) == 3
    for b in buttons:
        assert b.bound is not None, "button not wired"
        fn, inputs, outputs = b.bound
        assert callable(fn) and inputs and outputs
    # examples quick-load fed from examples/waterfall.*
    assert created["examples"], "no examples loaded"
    img, prompt, neg = created["examples"][0]
    assert img.endswith((".png", ".jpg"))
    assert "waterfall" in prompt.lower() or len(prompt) > 0


def test_find_examples_triples():
    from luciddreamer_tpu.app_gradio import find_examples

    ex = find_examples()
    # the procedural waterfall plus the ~20 reference prompt triples
    assert len(ex) >= 20
    img, prompt, neg = [
        e for e in ex if e[0].endswith(os.sep + "waterfall.png")
    ][0]
    assert "waterfall" in prompt.lower()
    assert "watermark" in neg.lower()
    # a reference triple carries its prompt + negative prompt
    img, prompt, neg = [e for e in ex if "modernvilla" in e[0]][0]
    assert "villa" in prompt.lower()
    assert "monochrome" in neg.lower()
