from tpurt.io.exr import read_exr, write_exr
from tpurt.io.image import read_image, write_image
