// Root layout for the Next 14 app router (required for `next build`).
// Parity: reference frontend/app/layout.tsx (presence, not content).
import "./globals.css";
import type { Metadata } from "next";

export const metadata: Metadata = {
  title: "mvslam-tpu dashboard",
  description:
    "Live TPU SLAM telemetry: trajectory, pose-graph edges, matching metrics.",
};

export default function RootLayout({
  children,
}: {
  children: React.ReactNode;
}) {
  return (
    <html lang="en">
      <body>{children}</body>
    </html>
  );
}
