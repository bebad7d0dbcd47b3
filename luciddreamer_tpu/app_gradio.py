"""Gradio UI for LucidDreamer-TPU (reference app.py / app_mini.py).

Wired like app_mini.py:65-236: image + prompt inputs, camera-path radios,
run/create/render buttons, video outputs.  Import-gated: the environment
must provide ``gradio`` (not bundled here).
"""
from __future__ import annotations


def build_demo(save_dir: str = "./gradio_output"):
    import gradio as gr  # gated import

    from luciddreamer_tpu.app import LucidDreamerTPU

    ld = LucidDreamerTPU(save_dir=save_dir)

    def run_all(image, prompt, neg_prompt, campath_gen, campath_render,
                seed, diff_steps, progress=None):
        ld.create(image, prompt, neg_prompt, campath_gen, int(seed),
                  int(diff_steps))
        rgb_path, depth_path = ld.render_video(campath_render)
        return rgb_path, depth_path

    def create_only(image, prompt, neg_prompt, campath_gen, seed, diff_steps):
        return ld.create(image, prompt, neg_prompt, campath_gen, int(seed),
                         int(diff_steps))

    def render_only(campath_render):
        rgb_path, depth_path = ld.render_video(campath_render)
        return rgb_path, depth_path

    with gr.Blocks(title="LucidDreamer-TPU") as demo:
        gr.Markdown("# LucidDreamer-TPU: image + text -> 3D Gaussian scene")
        with gr.Row():
            with gr.Column():
                image = gr.Image(type="pil", label="Input image")
                prompt = gr.Textbox(label="Text prompt")
                neg = gr.Textbox(label="Negative prompt")
                campath_gen = gr.Radio(
                    ["lookdown", "lookaround", "rotate360"],
                    value="lookdown", label="Generation camera path",
                )
                campath_render = gr.Radio(
                    ["back_and_forth", "llff", "headbanging"],
                    value="llff", label="Render camera path",
                )
                seed = gr.Number(value=1, label="Seed", precision=0)
                steps = gr.Slider(1, 50, value=30, step=1,
                                  label="Inpainting steps")
                btn_run = gr.Button("Run all")
                btn_create = gr.Button("Create scene")
                btn_render = gr.Button("Render video")
            with gr.Column():
                vid_rgb = gr.Video(label="RGB video")
                vid_depth = gr.Video(label="Depth video")
                ply_file = gr.File(label="Gaussian splat (.ply)")

        btn_run.click(
            run_all,
            [image, prompt, neg, campath_gen, campath_render, seed, steps],
            [vid_rgb, vid_depth],
        )
        btn_create.click(
            create_only,
            [image, prompt, neg, campath_gen, seed, steps],
            [ply_file],
        )
        btn_render.click(render_only, [campath_render], [vid_rgb, vid_depth])
    return demo


def main():
    demo = build_demo()
    demo.launch()


if __name__ == "__main__":
    main()
