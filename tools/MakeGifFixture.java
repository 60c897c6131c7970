import javax.imageio.*;
import javax.imageio.metadata.*;
import javax.imageio.stream.*;
import java.awt.image.BufferedImage;
import java.io.File;

/** One-off generator for the committed animated-GIF fixtures:
 *  - args[0]: 4 full frames, 9x7, solid red/green/blue/yellow, 10cs
 *    delay, infinite loop (the plain multi-frame case);
 *  - args[1] (optional): an INTER-FRAME-OPTIMIZED GIF -- frame 0 is a
 *    full 10x8 red screen, frame 1 is only a 4x3 green changed-rect
 *    PATCH placed at offset (2,1) with disposal "none" (the shape real
 *    GIF optimizers emit; correct playback must composite it onto the
 *    prior canvas).
 *  Run: javac MakeGifFixture.java && java MakeGifFixture out.gif patch.gif
 */
public class MakeGifFixture {
  static BufferedImage solid(int w, int h, int color) {
    BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB);
    for (int y = 0; y < h; y++)
      for (int x = 0; x < w; x++)
        img.setRGB(x, y, color);
    return img;
  }

  /** Write one frame with GIF controls (delay/disposal), an optional
   *  (left, top) placement, and on the first frame the NETSCAPE loop. */
  static void writeFrame(ImageWriter writer, BufferedImage img,
                         int left, int top, boolean first) throws Exception {
    ImageWriteParam p = writer.getDefaultWriteParam();
    IIOMetadata md = writer.getDefaultImageMetadata(
        ImageTypeSpecifier.createFromRenderedImage(img), p);
    String fmt = md.getNativeMetadataFormatName();
    IIOMetadataNode root = (IIOMetadataNode) md.getAsTree(fmt);
    IIOMetadataNode gce = new IIOMetadataNode("GraphicControlExtension");
    gce.setAttribute("disposalMethod", "none");
    gce.setAttribute("userInputFlag", "FALSE");
    gce.setAttribute("transparentColorFlag", "FALSE");
    gce.setAttribute("delayTime", "10");
    gce.setAttribute("transparentColorIndex", "0");
    root.appendChild(gce);
    if (left != 0 || top != 0) {
      for (int i = 0; i < root.getChildNodes().getLength(); i++) {
        IIOMetadataNode c = (IIOMetadataNode) root.getChildNodes().item(i);
        if (c.getNodeName().equals("ImageDescriptor")) {
          c.setAttribute("imageLeftPosition", Integer.toString(left));
          c.setAttribute("imageTopPosition", Integer.toString(top));
        }
      }
    }
    if (first) {
      IIOMetadataNode apps = new IIOMetadataNode("ApplicationExtensions");
      IIOMetadataNode app = new IIOMetadataNode("ApplicationExtension");
      app.setAttribute("applicationID", "NETSCAPE");
      app.setAttribute("authenticationCode", "2.0");
      app.setUserObject(new byte[]{1, 0, 0}); // loop forever
      apps.appendChild(app);
      root.appendChild(apps);
    }
    md.setFromTree(fmt, root);
    writer.writeToSequence(new IIOImage(img, null, md), p);
  }

  static void selfCheck(File out) throws Exception {
    try (ImageInputStream iis = ImageIO.createImageInputStream(out)) {
      ImageReader r = ImageIO.getImageReaders(iis).next();
      r.setInput(iis);
      System.out.println(out + ": frames=" + r.getNumImages(true)
          + " w=" + r.getWidth(0) + " h=" + r.getHeight(0)
          + " bytes=" + out.length());
    }
  }

  public static void main(String[] args) throws Exception {
    int[] colors = {0xFF0000, 0x00FF00, 0x0000FF, 0xFFFF00};
    ImageWriter writer = ImageIO.getImageWritersByFormatName("gif").next();
    File out = new File(args[0]);
    try (ImageOutputStream ios = ImageIO.createImageOutputStream(out)) {
      writer.setOutput(ios);
      writer.prepareWriteSequence(null);
      for (int f = 0; f < 4; f++)
        writeFrame(writer, solid(9, 7, colors[f]), 0, 0, f == 0);
      writer.endWriteSequence();
    }
    selfCheck(out);

    if (args.length > 1) {
      File patched = new File(args[1]);
      try (ImageOutputStream ios = ImageIO.createImageOutputStream(patched)) {
        writer.setOutput(ios);
        writer.prepareWriteSequence(null);
        writeFrame(writer, solid(10, 8, 0xFF0000), 0, 0, true);
        writeFrame(writer, solid(4, 3, 0x00FF00), 2, 1, false); // patch
        writer.endWriteSequence();
      }
      selfCheck(patched);
    }
    writer.dispose();
  }
}
