from tpurt.scene.api import PbrtAPI, load_scene, load_scene_string
from tpurt.scene.paramset import ParamSet, TextureParams
from tpurt.scene.records import SceneDescription
