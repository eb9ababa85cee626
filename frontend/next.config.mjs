/** @type {import('next').NextConfig} */
const nextConfig = {
  reactStrictMode: true,
  // The dashboard is served next to the WS backend; no image CDN.
  output: "standalone",
};

export default nextConfig;
